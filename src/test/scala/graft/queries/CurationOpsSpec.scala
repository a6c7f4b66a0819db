package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the round-5 curation operators (s06, t14–t16, mm05,
  * d10) that the hash-match oracle can't express: recall against the
  * exact baseline, monotonicity, exact-rate sampling properties. */
// excluded from the default `sbt test` (CI budget) — run with
// GRAFT_TEST_ALL=1 or `testOnly`; see build.sbt
@org.scalatest.tags.Slow
class CurationOpsSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("s06 quantized top-k recalls most of the exact top-10 (s01)") {
    def topk(q: Q): Map[Long, Set[Long]] =
      q.run(spark, sfDir).filter(col("rank") <= 10)
        .select("q_id", "c_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) =>
          k -> rs.map(_.getLong(1)).toSet
        }
    val exact = topk(Similarity.s01_cosine_topk)
    val quant = topk(Similarity.s06_quantized_ann)
    assert(exact.keySet == quant.keySet)
    val recalls = exact.map { case (q, ex) =>
      quant(q).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // int8 quantization only reorders neighbors within ~1/127 of each
    // other; unnormalized-dot vs cosine ranking adds the rest of the gap
    assert(mean >= 0.5, s"mean recall@10 vs exact baseline too low: $mean")
  }

  test("s08 binary sketch ranks far above chance against the exact top-10") {
    def topk(q: Q): Map[Long, Set[Long]] =
      q.run(spark, sfDir).filter(col("rank") <= 10)
        .select("q_id", "c_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) =>
          k -> rs.map(_.getLong(1)).toSet
        }
    val exact = topk(Similarity.s01_cosine_topk)
    val sketch = topk(Similarity.s08_binary_sketch)
    assert(exact.keySet == sketch.keySet)
    val recalls = exact.map { case (q, ex) =>
      sketch(q).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // 1 bit/dim is the coarse end of the quantization ladder: recall is
    // honest-but-modest (measured 0.26 on this corpus vs ~0.02 for
    // random top-10s — 13x chance). The gate pins "carries real signal",
    // not a precision it cannot have; use s07's rerank pattern on top
    // when quality matters.
    assert(mean >= 0.2, s"mean recall@10 vs exact baseline too low: $mean")
  }

  test("s09 PQ-ADC ranking carries real signal against the exact top-10") {
    def topk(q: Q): Map[Long, Set[Long]] =
      q.run(spark, sfDir).filter(col("rank") <= 10)
        .select("q_id", "c_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) =>
          k -> rs.map(_.getLong(1)).toSet
        }
    val exact = topk(Similarity.s01_cosine_topk)
    val pq = topk(Similarity.s09_pq_ann)
    assert(exact.keySet == pq.keySet)
    val recalls = exact.map { case (q, ex) =>
      pq(q).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // 32-bit codes are the second-coarsest rung of the quantization
    // ladder (s06 int8 512-bit: 0.5+; s08 sign 64-bit: ~0.26; here
    // 32-bit: measured 0.16 on this corpus vs ~0.02 for random top-10s
    // — 8x chance). The gate pins "carries real signal", not a
    // precision 4-byte codes cannot have; normalizing by the
    // reconstructed centroid norm (ADC-cosine) was measured recall-
    // neutral here (uniform-norm corpus) and is kept because it is the
    // right ranking target. Compose with s07's exact rerank pattern
    // when quality matters.
    assert(mean >= 0.1, s"mean recall@10 vs exact baseline too low: $mean")
  }

  test("t21 water-fill: feasible, budget-tight, caps respected") {
    val rows = Text.t21_token_budget.run(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    val budget = rows.map(_._2).sum * 4 / 5
    // never over-allocate a source beyond its capacity, and capped
    // sources take exactly their capacity
    rows.foreach { case (src, cap, _, capped, alloc) =>
      assert(alloc <= cap, s"$src allocated over capacity")
      if (capped) assert(alloc == cap, s"$src capped but not filled")
    }
    // within budget, and tight: the only loss is the per-uncapped-source
    // floor, so the shortfall is bounded by the uncapped count
    val total = rows.map(_._5).sum
    val nUncapped = rows.count(!_._4)
    assert(total <= budget, s"over budget: $total > $budget")
    assert(budget - total < math.max(nUncapped.toLong, 1L),
      s"water-fill left ${budget - total} tokens on the table")
    // both branches exercised at this SF (weights 1..20 vs ~uniform
    // capacities with B = 4/5 of total forces a mixed outcome)
    assert(rows.exists(_._4) && nUncapped > 0, "degenerate test corpus")
    // uncapped allocations are proportional to weight: within the same
    // uncapped set, alloc/w spreads by at most 1 (same floor(t*w) line)
    val lines = rows.filter(!_._4).map { case (_, _, w, _, a) => a / w }
    assert(lines.max - lines.min <= 1,
      s"uncapped sources sit on different water lines: $lines")
  }

  test("s07 two-stage rerank: recall@10 at least s06's, exact scores") {
    def topk(q: Q): Map[Long, Set[Long]] =
      q.run(spark, sfDir).filter(col("rank") <= 10)
        .select("q_id", "c_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) =>
          k -> rs.map(_.getLong(1)).toSet
        }
    def meanRecall(got: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]) = {
      val rs = exact.map { case (q, ex) =>
        got(q).intersect(ex).size.toDouble / ex.size
      }
      rs.sum / rs.size
    }
    val exact = topk(Similarity.s01_cosine_topk)
    val r06 = meanRecall(topk(Similarity.s06_quantized_ann), exact)
    val r07 = meanRecall(topk(Similarity.s07_quantized_rerank), exact)
    // re-ranking a 50-candidate superset with the exact cosine can only
    // improve on taking the quantized top-10 directly
    assert(r07 >= r06, s"rerank recall $r07 below quantized-only $r06")
    assert(r07 >= 0.8, s"two-stage recall@10 too low: $r07")
  }

  test("s06 scores with the codegen'd integer dot, broadcast query side") {
    val plan = Similarity.s06_quantized_ann.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("longdotproduct") || plan.contains("LongDotProduct"),
      s"expected native LongDotProduct in plan:\n$plan")
    assert(plan.contains("Broadcast"), s"query side not broadcast:\n$plan")
  }

  test("LongDotProduct: interpreted eval matches codegen and exact math") {
    import spark.implicits._
    import graft.functions.VectorFunctions.vec_qdot
    val df = Seq((Array(1L, -2L, 3L), Array(4L, 5L, -6L)))
      .toDF("a", "b")
      .select(vec_qdot(col("a"), col("b")).as("d"))
    assert(df.head().getLong(0) == (4 - 10 - 18))
  }

  test("t14: per-doc ranks are 1..3, tfidf non-increasing within a doc") {
    val rows = Text.t14_tfidf_keywords.run(spark, sfDir)
      .select("doc_id", "rank", "tfidf").collect()
      .groupBy(_.getLong(0))
    rows.foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length),
        s"doc $doc ranks not contiguous")
      val scores = sorted.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $doc tfidf not non-increasing: ${scores.toSeq}")
    }
  }

  test("t15: coverage is monotone in k and bounded by 1") {
    val rows = Text.t15_vocab_coverage.run(spark, sfDir)
      .orderBy("k").collect()
    assert(rows.length == 3)
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    assert(cov.forall(c => c > 0.0 && c <= 1.0))
    // total token occurrences must equal the direct corpus count
    val total = rows.head.getAs[Long]("total")
    val direct = graft.core.Tables(spark, sfDir, "documents")
      .select(sum(expr(
        "size(regexp_extract_all(text, '[a-z0-9]+', 0))")).cast("long"))
      .head().getLong(0)
    assert(total == direct, s"t15 total $total != corpus tokens $direct")
  }

  test("t16: smallest source keeps rate exactly 1.0; others near target") {
    val rows = Text.t16_mix_sampler.run(spark, sfDir).collect()
    val minDocs = rows.map(_.getAs[Long]("n_docs")).min
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val sampled = r.getAs[Long]("n_sampled")
      assert(sampled <= n)
      if (n == minDocs)
        assert(sampled == n,
          s"smallest source ${r.getAs[String]("source")} not fully kept")
      else {
        // md5 buckets are uniform: achieved rate within ±0.25 absolute of
        // target at this tiny SF (25 docs/source)
        val achieved = r.getAs[Double]("achieved_rate")
        val target = r.getAs[Double]("target_rate")
        assert(math.abs(achieved - target) < 0.25,
          s"source ${r.getAs[String]("source")}: $achieved vs $target")
      }
    }
  }

  test("t16 sampling membership is append-stable for unchanged sources") {
    // the keep decision depends only on (doc_id, own-source count,
    // min count) — rerunning yields identical sampled counts
    val a = Text.t16_mix_sampler.run(spark, sfDir).collect().toSeq
    val b = Text.t16_mix_sampler.run(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("mm05: entropy bounded by log2(16)+Mitchell error, buckets sane") {
    val rows = Multimodal.mm05_byte_entropy.run(spark, sfDir).collect()
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val used = r.getAs[Long]("n_buckets_used")
      val share = r.getAs[Double]("top_bucket_share")
      assert(h >= 0.0 && h <= 4.1, s"entropy out of range: $h")
      assert(used >= 0L && used <= 16L)
      assert(share >= 0.0 && share <= 1.0)
      if (r.getAs[Long]("n_bytes") > 0) {
        assert(used >= 1L)
        // single-bucket payload => zero entropy; multi-bucket => positive
        if (used == 1L) assert(h == 0.0) else assert(h > 0.0)
      }
    }
  }

  test("mm05 is shuffle-free after the split-spreading repartition") {
    val plan = Multimodal.mm05_byte_entropy.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    // one exchange for the repartition, one for the final global sort —
    // no aggregate or join in between
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"),
      s"unexpected shuffle-bearing operator:\n$plan")
  }

  test("d10: every template group has >=2 docs and a consistent span") {
    val rows = Dedup.d10_prefix_templates.run(spark, sfDir).collect()
    assert(rows.nonEmpty, "no prefix-template groups at smoke SF")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2L)
      assert(r.getAs[Long]("min_doc") < r.getAs[Long]("max_doc"))
    }
  }

  test("d11: dup_share bounded; d10 template docs have a shared window") {
    val d11 = Dedup.d11_dup_window_share.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    d11.values.foreach { r =>
      val share = r.getAs[Double]("dup_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_windows"))
    }
    // a d10 prefix-template doc's first 5-token window IS the shared
    // prefix, so its d11 n_shared must be >= 1 — provided the doc HAS a
    // 5-token window (d10 also groups shorter docs by their full prefix,
    // where d11 by design reports zero windows)
    val templateDocs = Dedup.d10_prefix_templates.run(spark, sfDir)
      .select("min_doc").collect().map(_.getLong(0))
    templateDocs.foreach { doc =>
      if (d11(doc).getAs[Long]("n_windows") >= 1L)
        assert(d11(doc).getAs[Long]("n_shared") >= 1L,
          s"template doc $doc has no shared window in d11")
    }
  }

  test("d12: cluster assignment is a valid partition closed over edges") {
    val rows = Dedup.d12_dup_clusters.run(spark, sfDir).collect()
    val cluster = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
    // cluster_id is the component minimum and a member of the cluster
    cluster.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid,
        s"cluster $cid labeled by non-minimum")
      assert(sizes(cid) == members.size.toLong)
    }
    // closure: every qualifying LSH edge joins its endpoints' clusters
    Dedup.d04_lsh_pairs.run(spark, sfDir)
      .filter(col("est_sim") >= 0.5)
      .select("a_id", "b_id").collect().foreach { r =>
      assert(cluster(r.getLong(0)) == cluster(r.getLong(1)),
        s"edge (${r.getLong(0)},${r.getLong(1)}) spans two clusters")
    }
    // the graph actually has non-trivial components at smoke scale
    assert(rows.exists(_.getLong(2) >= 2L), "no multi-doc cluster; weak test")
  }

  test("star-contraction CC equals min-label CC on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val n = rnd.nextInt(25) + 5
      val ids = (0L until n).toSeq
      val edges = Seq.fill(rnd.nextInt(2 * n))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val nodes = ids.toDF("id")
      val e = edges.toDF("src", "dst")
      def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = labelMap(Dedup.connectedComponentsStar(nodes, e))
      val prop = labelMap(Dedup.connectedComponents(nodes, e))
      assert(star == prop,
        s"CC mismatch on n=$n edges=$edges:\nstar=$star\nprop=$prop")
    }
  }

  test("min-label CC runs ONE action per propagation round (sum fixpoint)") {
    // Round-10 advice: the old convergence check joined each round's
    // labels against the previous round's — a second full distributed
    // pass (a second Dataset action) per iteration. The monotone-sum
    // check is a 1-row aggregate on the frame the round computed
    // anyway, so a k-round propagation runs ~k actions, not ~2k.
    // Pin via QueryExecutionListener (action-level, stable under AQE's
    // per-stage job splitting): an 8-node chain (diameter 7 => 8
    // rounds to fixpoint) must stay within rounds + small-constant
    // actions — the two-pass loop needed roughly double.
    import spark.implicits._
    val nodes = (0L until 8L).toDF("id")
    val chain = (0L until 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { counter.incrementAndGet(); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val labels = Dedup.connectedComponents(nodes, chain)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Thread.sleep(500) // execution-listener events are async; drain
      assert(labels.values.forall(_ == 0L), "chain must collapse to 0")
      // 8 rounds x 1 sum + initial sum + the localCheckpoint + this
      // test's collect ~= 11; the old loop's extra join pass would
      // push past 18
      val actions = counter.get()
      assert(actions <= 13 && actions >= 9,
        s"expected ~1 action per round (+constant), saw $actions")
    } finally spark.listenerManager.unregister(listener)
  }

    test("star-contraction CC collapses a long chain (high-diameter graph)") {
    // a 200-hop duplicate chain: min-label propagation would need 200
    // distributed rounds (one per hop); star contraction takes O(log n)
    // — this is the production path d12's scaladoc points at for
    // adversarial component shapes
    import spark.implicits._
    val n = 200L
    val nodes = (0L until n).toDF("id")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = Dedup.connectedComponentsStar(nodes, chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L),
      "chain must collapse to a single component rooted at 0")
  }

  test("d10 shuffles digests, not text") {
    val plan = Dedup.d10_prefix_templates.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the md5 projection must happen below the exchange: text never
    // crosses the wire
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(prefix_fp")
    assert(exchangeIdx >= 0, s"expected hash exchange on prefix_fp:\n$plan")
  }

  test("t23 entropy: 0 for single-lang source, exactly 1 bit for a 50/50") {
    // srcA: 4 docs all en => H = 0. srcB: 2 en + 2 fr => H = 1 bit, and
    // the Mitchell ladder is EXACT here (log2 of a power of two), so we
    // assert equality, not closeness.
    import spark.implicits._
    val dir = tmpDir("t23fix")
    Seq(
      (1L, "a", "en", "srcA", 1L), (2L, "b", "en", "srcA", 1L),
      (3L, "c", "en", "srcA", 1L), (4L, "d", "en", "srcA", 1L),
      (5L, "e", "en", "srcB", 1L), (6L, "f", "en", "srcB", 1L),
      (7L, "g", "fr", "srcB", 1L), (8L, "h", "fr", "srcB", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Text.t23_lang_entropy.run(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      "srcA" -> ((4L, 1L, 0.0)),
      "srcB" -> ((4L, 2L, 1.0))), s"got $got")
  }

  test("t23 entropy is bounded by log2(n_langs) + Mitchell error at sf") {
    val rows = Text.t23_lang_entropy.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getDouble(3)
      val maxH = math.log(r.getLong(2).toDouble) / math.log(2.0)
      assert(h >= 0.0 && h <= maxH + 0.086,
        s"${r.getString(0)}: H=$h outside [0, log2(${r.getLong(2)})+eps]")
    }
  }

  test("d17 attributes duplicates to the flooding source") {
    // srcA repeats one document three times (one canonical + two dups);
    // srcB holds two distinct docs. The LSH pipeline must pin the whole
    // dup burden on srcA and none on srcB.
    import spark.implicits._
    val dir = tmpDir("d17fix")
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (1L, dup, "en", "srcA", dup.length.toLong),
      (2L, dup, "en", "srcA", dup.length.toLong),
      (3L, dup, "en", "srcA", dup.length.toLong),
      (4L, "spark shuffles partition data between executor stages fast",
        "en", "srcB", 60L),
      (5L, "ducks paddle calmly across the winter lake at dawn today",
        "en", "srcB", 58L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Dedup.d17_dup_rate_by_source.run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got("srcA") == ((3L, 2L, 3L, 0.666667)), s"got $got")
    assert(got("srcB") == ((2L, 0L, 0L, 0.0)), s"got $got")
  }

  test("s10 flags the inflated-norm vector and only it") {
    // label 0: 49 unit-norm vectors + one at norm 10 — z = (10-1.18)/1.26
    // ≈ 7, far past 3σ even though the outlier inflates the σ it is
    // tested against. label 1: all unit norms, zero variance => the
    // strict squared test (0 > 0) must flag nothing.
    import spark.implicits._
    val dir = tmpDir("s10fix")
    def unitVec: Seq[Float] = 1.0f +: Seq.fill(63)(0.0f)
    def bigVec: Seq[Float] = 10.0f +: Seq.fill(63)(0.0f)
    val rows =
      (0 until 49).map(i => (i.toLong, unitVec, 0)) ++
        Seq((49L, bigVec, 0)) ++
        (50 until 60).map(i => (i.toLong, unitVec, 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.s10_norm_outliers.run(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3)))).toMap
    assert(got(0) == ((50L, 1.18, 1L)), s"got $got")
    assert(got(1) == ((10L, 1.0, 0L)), s"got $got")
  }

  test("t22 KS matches the by-hand computation on a controlled corpus") {
    // srcA lengths {10,20,30,40}, srcB {10,10}; corpus n=6.
    // Pooled grid {10,20,30,40}; cum_A=[1,2,3,4] vs cum=[3,4,5,6]:
    // |cum_A*6 - cum*4| = [6,4,2,0] => ks_num=6, ks=6/(4*6)=0.25.
    // cum_B=[2,2,2,2]: |cum_B*6 - cum*2| = [6,4,2,0] => ks_num=6,
    // ks=6/(2*6)=0.5 — same max gap, half the sample, double the drift.
    import spark.implicits._
    val dir = tmpDir("t22fix")
    Seq(
      (1L, "a", "en", "srcA", 10L), (2L, "b", "en", "srcA", 20L),
      (3L, "c", "en", "srcA", 30L), (4L, "d", "en", "srcA", 40L),
      (5L, "e", "en", "srcB", 10L), (6L, "f", "en", "srcB", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Text.t22_length_drift.run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got == Map(
      "srcA" -> ((4L, 6L, 0.25)),
      "srcB" -> ((2L, 6L, 0.5))), s"got $got")
  }
}
