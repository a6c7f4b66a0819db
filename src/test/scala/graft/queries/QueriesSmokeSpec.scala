package graft.queries

import graft.SparkSpec

/** Every declared query must run on the t1 smoke scale factor — this is
  * the driver's entry/row-count gate in miniature. */
class QueriesSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  /** Every registered query is oracle-gated (the approx-sketch variant is
    * a library function, error-band-tested below, not a registered query —
    * engine-specific estimates can't hash-match an oracle). */
  private val rowsOnlyByDesign = Set.empty[String]

  test("every query has an oracle or documented rows-only status") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert((q -- o) == rowsOnlyByDesign,
      s"undocumented rows-only queries: ${q -- o -- rowsOnlyByDesign}")
  }

  test("approx sketches land within error bands of exact answers") {
    val approx = Advanced.approxSketches(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = graft.core.Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        org.apache.spark.sql.functions.countDistinct("l_partkey").as("d"),
        org.apache.spark.sql.functions.expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      assert(math.abs(a.getLong(1) - e.getLong(1)).toDouble / e.getLong(1) < 0.05,
        s"HLL estimate off >5% for $flag")
      assert(math.abs(a.getDouble(2) - e.getDouble(2)) / e.getDouble(2) < 0.05,
        s"quantile estimate off >5% for $flag")
    }
  }

  test("q42 year filter reaches the parquet scan as a pushed range") {
    val plan = Stats.q42_relational_division.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThan(o_orderdate"),
      s"o_orderdate range not in PushedFilters:\n$plan")
  }

  test("correlated subqueries decorrelate to joins (no per-row re-execution)") {
    Seq(Subqueries.q43_min_cost_supplier, Subqueries.q45_small_qty_brand,
      Subqueries.q46_part_share_suppliers).foreach { q =>
      val plan = q.run(spark, sfDir).queryExecution.optimizedPlan.toString
      assert(!plan.contains("scalar-subquery"),
        s"${q.name} still contains an un-decorrelated scalar subquery:\n$plan")
    }
    val q48 = Subqueries.q48_idle_rich_custs.run(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(q48.contains("LeftAnti"),
      s"q48 NOT EXISTS did not plan as an anti join:\n$q48")
  }

  test("q47 single-pass form scans lineitem exactly once") {
    val plan = Subqueries.q47_waiting_suppliers.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 lineitem scan, found $scans:\n$plan")
  }

  test("q44 single-pass form scans lineitem exactly once and returns rows") {
    val df = Subqueries.q44_value_share.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 lineitem scan, found $scans:\n$plan")
    // threshold is scale-relative: non-empty at every SF by design
    assert(df.count() > 0, "q44 returned no rows at smoke scale")
  }

  test("t11 single-scan form reads documents exactly once") {
    val plan = Text.t11_repetition.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "documents\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 documents scan, found $scans:\n$plan")
  }

  test("d09 pair generation is an equi-join on the cell, never nested-loop") {
    // the only nested-loop allowed is the k-row centroid broadcast; the
    // PAIR join (the part that touches n^2 candidates if blocking breaks)
    // must be a hash/sort-merge equi-join on the assignment cell.
    // String-matched because collect() does not descend into
    // AdaptiveSparkPlanExec's inner plan.
    val plan = Dedup.d09_semantic_neardup.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    // examine only the OUTER pair-join plan: everything from the first
    // InMemoryRelation down is the cached assignment subtree, which
    // legitimately contains the k-row centroid broadcast (and prints once
    // per join side)
    val outer = plan.split("InMemoryRelation")(0)
    assert(
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[label".r
        .findFirstIn(outer).isDefined,
      s"no equi-join on the cell found for d09 pair generation:\n$plan")
    assert(!outer.contains("BroadcastNestedLoopJoin") &&
      !outer.contains("CartesianProduct"),
      s"nested-loop join in d09 pair generation:\n$plan")
  }

  test("t13 scoring join never broadcasts the vocab (100TB shape)") {
    // vocab is one row per distinct corpus token — Heaps' law makes that
    // 1e8+ at 100 TB, so the scoring join must stay a shuffled hash join
    // (partitioned build side) at EVERY scale, never a vocab broadcast.
    // Materialize first: the pin is on the AQE-final plan, and the hint
    // must hold even where the bench-scale vocab is broadcastable.
    val df = Text.t13_surprisal.run(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("ShuffledHashJoin \\[tok".r.findFirstIn(plan).isDefined,
      s"t13 tok join is not a shuffled hash join:\n$plan")
    assert("BroadcastHashJoin \\[tok".r.findFirstIn(plan).isEmpty,
      s"t13 vocab side got broadcast:\n$plan")
    // the single-task global window over vocab is gone too: n_total is a
    // plain scalar aggregate (1-row broadcast), so no Window at all here
    assert(!plan.contains("Window"),
      s"t13 still computes n_total via a window:\n$plan")
  }

  test("t15 ranks only the top-1000 vocab rows, total via plain aggregate") {
    // |vocab| is unbounded in corpus size: the rank source must be
    // TakeOrderedAndProject (per-partition top-k heaps), the only Window
    // input the constant 1000-row candidate set, and the grand total a
    // scalar aggregate — never a single-partition window over all vocab
    // rows. The duplicated vocab aggregate must reuse one exchange.
    val df = Text.t15_vocab_coverage.run(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject(limit=1000"),
      s"t15 top-1000 did not plan as TakeOrderedAndProject:\n$plan")
    assert(plan.split("Window \\[", -1).length == 2,
      s"t15 has a window beyond the bounded top-1000 rank:\n$plan")
    assert("Window \\[row_number[\\s\\S]{0,400}?TakeOrderedAndProject".r
      .findFirstIn(plan).isDefined,
      s"t15's rank window does not read the top-1000 candidate set:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"t15 vocab aggregate is computed twice (no exchange reuse):\n$plan")
  }

  test("t19 model and context joins never broadcast (bigram vocab is unbounded)") {
    // the bigram vocabulary is strictly larger than t13's unigram vocab,
    // so BOTH vocab-sized joins — scoring on `big`, context counts on
    // `w1` — must stay shuffled hash joins at every scale; a broadcast
    // anywhere here is the bench-scale plan lying about 100 TB.
    val df = Text.t19_bigram_surprisal.run(spark, sfDir)
    df.collect()
    // NOT split on "== Initial Plan ==": the cached bigram stream embeds
    // a nested AdaptiveSparkPlan whose own Initial-Plan marker would
    // truncate the outer tree before the context join prints. Scan the
    // full string instead: every join in this query must be a shuffled
    // hash join (the context join's key prints as the collapsed
    // split_part expression, so pin the node types, not the key names).
    val plan = df.queryExecution.executedPlan.toString
    assert("ShuffledHashJoin \\[big".r.findFirstIn(plan).isDefined,
      s"t19 scoring join is not a shuffled hash join:\n$plan")
    Seq("BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin",
      "CartesianProduct").foreach { bad =>
      assert(!plan.contains(bad), s"t19 planned a $bad:\n$plan")
    }
  }

  test("t20 token join never broadcasts; only bounded sides broadcast") {
    // c_t is |vocab| rows (unbounded) — must join shuffled on tok; the
    // per-source totals (|sources| rows) and the 1-row corpus total are
    // the only legitimate broadcasts.
    val df = Text.t20_source_kl.run(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("ShuffledHashJoin \\[tok".r.findFirstIn(plan).isDefined,
      s"t20 tok join is not a shuffled hash join:\n$plan")
    assert("BroadcastHashJoin \\[tok".r.findFirstIn(plan).isEmpty,
      s"t20 vocab-sized c_t side got broadcast:\n$plan")
  }

  test("t22 windows are all source-partitioned; no cartesian product") {
    // the KS cumulative windows must ride the per-source partitioning
    // (a global window would funnel the |S|x|V| grid through one task —
    // the t15 lesson); the only cross joins are k-row broadcast sides.
    val df = Text.t22_length_drift.run(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("Window"), s"t22 lost its windows:\n$plan")
    assert(!"windowspecdefinition\\(n_chars".r.findFirstIn(plan).isDefined &&
      "windowspecdefinition\\(source".r.findFirstIn(plan).isDefined,
      s"t22 window is not partitioned by source:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"t22 planned a CartesianProduct:\n$plan")
  }

  test("t24 never ranks the vocabulary — freq-of-freqs windows only (100TB shape)") {
    // Round-7 verdict Wrong #2: row_number over
    // Window.partitionBy(source).orderBy(c, tok) put one source's ENTIRE
    // (corpus-growing) vocabulary in a single task. The Gini is now an
    // exact frequency-of-frequencies decomposition: no rank at all, and
    // every window input has been aggregated to (source, c) — sub-linear
    // (<= sqrt(2N) rows/source) — before any windowspec applies.
    val df = Text.t24_vocab_gini.run(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"),
      s"t24 still ranks the vocabulary with row_number:\n$plan")
    assert("windowspecdefinition\\(source".r.findFirstIn(plan).isDefined,
      s"t24 lost its cumulative freq-of-freqs windows:\n$plan")
    // the <=64-row/source bucket-offset grid must come back as a
    // broadcast, never a shuffled join against the freq-of-freqs stream
    assert(plan.contains("BroadcastHashJoin"),
      s"t24 bucket-offset grid is not broadcast-joined:\n$plan")
    // freq-of-freqs is cached once for its two consumers (grid + stream)
    // rather than re-tokenizing the corpus twice
    assert(Seq("InMemoryRelation", "InMemoryTableScan",
      "TableCacheQueryStage").exists(plan.contains),
      s"t24 freq-of-freqs subtree is not cached:\n$plan")
  }

  test("t26 prefix scan is pid-keyed — no per-source data window (100TB shape)") {
    // The packing prefix must come from PrefixSum's two-pass scan: the
    // only window over DATA rows is keyed by (__ps_pid, source), so a
    // dominant source is split across range partitions instead of
    // funneled through one task. A windowspecdefinition(source, doc_id)
    // would be the t24-round-7 one-task shape sneaking back in.
    val df = Corpus.t26_seq_pack.run(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(__ps_pid".r.findFirstIn(plan).isDefined,
      s"t26 lost the pid-keyed local prefix window:\n$plan")
    assert(!"windowspecdefinition\\(source#\\d+, doc_id".r.findFirstIn(plan)
      .isDefined,
      s"t26 windows data rows per source (one-task-per-source shape):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"t26 offset grid is not broadcast-joined:\n$plan")
  }

  test("q60 keeps the k minima per partition before the single merge") {
    val df = Corpus.q60_kmv_distinct.run(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"q60 sorts globally instead of per-partition top-k:\n$plan")
  }

  test("d01 shuffles digests, not document bodies") {
    // README's scale claim, measured: exact dedup reduces each document
    // to (md5, id, n_chars) BEFORE any exchange, so total shuffle-write
    // bytes must be a small fraction of the corpus text it deduplicates
    // (at 100 TB this is the difference between shuffling digests and
    // re-shuffling the corpus)
    import org.apache.spark.sql.functions._
    val textBytes = graft.core.Tables(spark, sfDir, "documents")
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    val (_, shuffle) = graft.tools.ShuffleMeter.measure(spark) {
      Dedup.d01_exact_dedup.run(spark, sfDir).count()
    }
    assert(shuffle.bytesWritten > 0, "expected a digest shuffle")
    assert(shuffle.bytesWritten < textBytes / 3,
      s"d01 shuffled ${shuffle.bytesWritten}B against ${textBytes}B of text " +
        "— document bodies are leaking into the exchange")
  }

  test("t31 shuffles term postings, not document text (100TB shape)") {
    // BM25's term filter lands BEFORE the postings groupBy, so the
    // exchange carries rows for the |terms| query tokens only — at
    // 100 TB the corpus text must never cross the wire. Measured on a
    // MULTI-FILE corpus (the 100 TB shape, FanOutSpec's 64-file bound)
    // so Tables.fanOut is the identity: the single-file bench corpus
    // would legitimately round-robin the text once to parallelize
    // tokenization, which is exactly the shuffle fanOut gates off at
    // scale.
    // Text is scaled 20x (docs ~5 KB, the web-document shape) while the
    // posting-row count stays fixed — if shuffle bytes track text
    // volume at all, the ratio bound below cannot hold.
    import org.apache.spark.sql.functions._
    val dir = tmpDir("bm25-multifile")
    graft.core.Tables(spark, sfDir, "documents")
      .withColumn("text", expr("repeat(text, 20)"))
      .repartition(64).write.parquet(s"$dir/documents.parquet")
    val docs = graft.core.Tables(spark, dir, "documents")
    assert(docs.rdd.getNumPartitions >=
      spark.sparkContext.defaultParallelism,
      "precondition: the copy must plan as a many-split scan")
    val textBytes = docs
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    val (_, shuffle) = graft.tools.ShuffleMeter.measure(spark) {
      graft.queries.Search.t31_bm25.run(spark, dir).count()
    }
    assert(shuffle.bytesWritten < textBytes / 3,
      s"t31 shuffled ${shuffle.bytesWritten}B against ${textBytes}B of " +
        "text — the corpus is leaking into the exchange")
  }

  test("bm25 cutoff selects by the UNTRUNCATED score — n6-tie fixture") {
    // Round-8 verdict #1: Spark used to order its top-k by the truncated
    // score_n6 while the DuckDB oracle orders by the untruncated
    // score_n18 — green on data without sub-truncation collisions,
    // broken on the first corpus with one. This corpus manufactures the
    // collision: 10k docs all containing the query term (df = N makes
    // idf tiny), docs 0..39 with DISTINCT lengths dl = 10 + (39 - i)
    // (higher doc_id => shorter doc => strictly higher n18 score) and
    // the rest dl = 100 (rank far below). Adjacent top scores then
    // differ by < 1e12 — n6-equal but n18-distinct — so an n6-keyed
    // top-20 (doc_id tie-break) picks a DIFFERENT set and order than
    // the oracle's n18 key. The in-test BigInt model replicates both
    // engines' integer math end-to-end.
    import org.apache.spark.sql.functions._
    val dir = tmpDir("bm25-cutoff")
    val n = 10000
    spark.range(n)
      .selectExpr("id AS doc_id",
        "CASE WHEN id < 40 THEN 10 + (39 - id) ELSE 100 END AS dl")
      .selectExpr("doc_id",
        "concat('spark', repeat(' pad', dl - 1)) AS text")
      .write.parquet(s"$dir/documents.parquet")

    // Self-contained integer model of the shared scoring rule.
    def mitchellN9(num: BigInt, den: BigInt): BigInt = {
      val k = (num / den).bitLength - 1
      val p = den << k
      BigInt(k) * 1000000000L + (num - p) * BigInt(1000000000L) / p
    }
    val dls = (0 until n).map(i => if (i < 40) 10 + (39 - i) else 100)
    val total = BigInt(dls.sum)
    val bigN = BigInt(n)
    val idf = mitchellN9(2 * bigN + 2, 2 * bigN + 1) // df = N
    val scored = dls.zipWithIndex.map { case (dl, i) =>
      val tfterm = (BigInt(44) * total * BigInt(1000000000L)) /
        (BigInt(26) * total + BigInt(18) * dl * bigN)
      (i.toLong, idf * tfterm)
    }
    val byN18 = scored.sortBy { case (id, s) => (-s, id) }
      .take(graft.queries.Search.Bm25K).map(_._1)
    val byN6 = scored
      .sortBy { case (id, s) => (-(s / BigInt(1000000000000L)), id) }
      .take(graft.queries.Search.Bm25K).map(_._1)
    assert(byN18 != byN6 && byN18.toSet != byN6.toSet,
      "fixture failed to manufacture an n6 collision at the boundary — " +
        "re-tune N/dl (the hazard is then untested, not absent)")

    // Inline t31 AND the persisted-index probe must both select by n18.
    val gotInline = graft.queries.Search.t31_bm25.run(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(gotInline == byN18,
      s"t31 selected by the truncated key:\n got=$gotInline\n exp=$byN18")
    val root = tmpDir("bm25-cutoff-idx")
    graft.operators.InvertedIndex.buildIfMissing(spark, dir, root)
    val gotIdx = graft.operators.InvertedIndex
      .probe(spark, root, graft.queries.Search.Bm25Terms)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(gotIdx == byN18,
      s"t32 probe selected by the truncated key:\n got=$gotIdx\n exp=$byN18")
  }

  test("the full query pack is present — a dropped lane is a failure") {
    // Round 6 lost the 9-query events lane SILENTLY: the correctness
    // artifact just had fewer rows. Pin the pack size and the lane
    // rosters so any disappearance is a named failure. Update the count
    // deliberately when adding queries — never let it float.
    val names = graft.SparkEntry.queries.keySet
    assert(names.size == 160, s"query pack shrank/grew: ${names.size}")
    val corpusLane = Set("t26_seq_pack", "t27_pii_scan", "t28_pack_segments",
      "t29_gopher_filter", "t30_temperature_mix", "d18_span_dedup",
      "q60_kmv_distinct", "t33_bpe_pairs", "t34_filter_agreement",
      "t37_train_shuffle", "t38_quality_budget_sample", "t39_bpe_encode",
      "t40_snapshot_cdc", "t41_snapshot_skipread", "t42_bpe_encode_ranks",
      "t43_incremental_mv", "t44_snapshot_optimize",
      "t45_incremental_mv_minmax", "t48_lake_sql", "t49_mv_distinct")
    assert((corpusLane -- names).isEmpty,
      s"corpus-prep lane missing: ${corpusLane -- names}")
    val searchLane = Set("q62_length_quantiles", "t31_bm25",
      "t32_bm25_probe", "t35_bm25_batch", "t36_bm25_batch_probe",
      "t46_bm25_tokenized", "t47_bm25_batch_tokenized",
      "t50_bm25_batch_zipf")
    assert((searchLane -- names).isEmpty,
      s"search lane missing: ${searchLane -- names}")
    val eventsLane = Set("q13_events_hourly", "q15_sessionize",
      "q17_pivot", "q18_json_extract", "q26_asof_join", "q27_range_join",
      "q29_funnel", "q30_retention", "q54_event_transitions",
      "q55_top_transitions", "q56_session_stats")
    assert((eventsLane -- names).isEmpty,
      s"events lane missing: ${eventsLane -- names}")
  }

  graft.SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
