package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR.
  *
  * Measurement protocol (round-2 verdict item 2): one untimed warmup run
  * per query (pays Janino whole-stage-codegen compilation, file-index and
  * shuffle-service warmup), then `SPARK_GRAFT_BENCH_RUNS` (default 3)
  * timed runs, reporting the per-query MEDIAN — a single cold pass showed
  * phantom 2-6x swings on untouched queries from JVM warmup and machine
  * load.
  *
  * Output: a human-readable full-precision detail line first (per-query
  * min/median/max across the timed runs), then ONE compact JSON line
  * LAST. The contract line is SIZE-BOUNDED BY CONSTRUCTION — total,
  * counts, an explicit `failed` marker, load averages, and only the 10
  * slowest query medians — so it stays well under 1 KB at ANY pack size
  * and fits inside the driver's bounded stdout tail (the round-7 artifact
  * carried all 117 per-query entries, overflowed the tail, and lost its
  * head including the total → `parsed:null`). Full per-query spread
  * lives in the detail line and the per-run file.
  *
  * Noise accountability: per-query min/median/max plus /proc/loadavg
  * sampled at start and end make a contaminated measurement window
  * self-evident FROM THE ARTIFACT (round 7: q53 showed 6.81s in the
  * driver window vs 0.86s idle — indistinguishable from a regression
  * when only a median is recorded). A wide (max-min) spread or a high
  * load average says "noise", a tight spread at a high median says
  * "plan cost".
  *
  * The bench also DEFENDS the artifact against a bad window instead of
  * only describing one (round-12 verdict item 1 — the official r12
  * artifact carried a 13x t42 regression and an 11x t47 spread
  * silently, both absent from a clean window):
  *  - per-query loadavg (`load` in the detail line), sampled as each
  *    query's timed runs start — which rows paid for window
  *    contention is record, not inference;
  *  - spread guard: a query whose max/min exceeds 3x (above a 0.2 s
  *    absolute floor) re-runs its full timed set once and keeps the
  *    lower-median set, recording the first median as `med_first`;
  *  - suspect list: any med exceeding 2x its committed clean-window
  *    reference (tools/spark_meds.tsv, same sf + host only) is named
  *    in the contract line's `suspect` array — `"suspect":[]` is the
  *    attestation that the guard ran and found nothing;
  *  - settle gate + suspect re-measure tail (round-13 verdict item 2:
  *    the r13 driver window ran at loadavg 5-7.6 and flagged 16 rows a
  *    clean window shows at normal levels): the timed section waits —
  *    bounded by SPARK_GRAFT_BENCH_SETTLE_SEC — for the 1-min load to
  *    drop under SPARK_GRAFT_BENCH_SETTLE_LOAD, and every pack-window
  *    suspect gets one more full timed set at the END of the pack
  *    (after another settle wait); the lower median wins, with the
  *    contaminated median kept as `med_first` and the tail's size as
  *    `remeasured` — a row that re-measures high is a real regression
  *    and stays suspect;
  *  - `baseline_gen`: a content hash of the DuckDB baseline's data
  *    rows rides the contract line, so two rounds' like_for_like
  *    ratios are machine-checkably same-denominator; a baseline whose
  *    recorded `#gen` header disagrees with its content drops the
  *    ratio entirely.
  *
  * Scale accountability: each query's cold-computation shuffle-write
  * bytes (measured on the warmup run via ShuffleMeter — warm runs skip
  * exchanges feeding cached subtrees) ride the detail line as
  * `shuffle_bytes`, so "digest-only / dimension-sized shuffles" is a
  * per-round measured number, comparable across SFs and rounds. The
  * three persisted indexes are deleted and rebuilt cold BEFORE the
  * query loop, timed into `index_build` (contract + detail lines):
  * build-cost regressions become visible, and the probe queries'
  * shuffle_bytes measure pure probe traffic independent of what a
  * prior run left on disk.
  */
object Bench {
  /** One query's measurement: med/min/max over the kept timed-run set,
    * cold-run shuffle bytes, the 1-min loadavg as its timed runs began,
    * and — when the spread guard re-measured — the FIRST set's median
    * (so a correction is auditable in the artifact, never silent). */
  private final case class BenchRow(
      name: String, mn: Double, med: Double, mx: Double,
      shuf: Long, load: Double, firstMed: Option[Double],
      nJobs: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // Tuning experiments: SPARK_GRAFT_CONF="k=v;k=v" overlays any conf.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k.trim, v.trim)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Scheduled-job counter (round-16 verdict item 2: make the per-job
    // scheduling floor machine-readable). Each timed run's job count
    // rides the detail line; the floor-adjusted like-for-like cut
    // subtracts count x measured floor from each row.
    val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCounter.incrementAndGet()
      })

    // 1-minute load average, sampled at start and end of the timed
    // section. -1 when unreadable (non-Linux) — the field is still
    // present so consumers need no schema branch.
    def loadAvg(): Double =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split("\\s+").head.toDouble finally src.close()
      } catch { case scala.util.control.NonFatal(_) => -1.0 }

    // JVM/session warmup (class loading, codegen infrastructure, file
    // index): generic work that touches every table once. Fault-isolated
    // per table: a single unreadable/drifted table must degrade the
    // artifact (its queries time out as -1 below), never abort the whole
    // run before a query is timed — BENCH_r06 lost every number to one
    // broken loader here.
    graft.core.Tables.names.foreach { t =>
      try graft.core.Tables(spark, sfDir, t).count()
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[bench] WARNING: warmup failed for table '$t': " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // Persisted-index BUILD cost, measured explicitly (round-8 verdict
    // item 7): the pack's probe queries (d15/s05/t32/t36) reuse the
    // persisted indexes, so a build-time regression was invisible in
    // every BENCH artifact. Each index is deleted and rebuilt COLD here,
    // timed, BEFORE the per-query loop — which also pins the probes'
    // warmup-measured shuffle_bytes to pure probe traffic regardless of
    // whether a prior run left an index on disk (round-8 advice: the
    // old behavior made those bytes order- and state-dependent). A
    // build that throws records -1, same contract as a failed query.
    val indexBuilds: Seq[(String, Double)] = Seq[(String, () => Unit)](
      ("dedup", () => {
        val r = graft.operators.DedupIndex.defaultRoot(sfDir)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
        graft.operators.DedupIndex.buildIfMissing(spark, sfDir, r)
      }),
      ("ann", () => {
        val r = graft.operators.AnnIndex.defaultRoot(sfDir)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
        graft.operators.AnnIndex.buildIfMissing(spark, sfDir, r)
      }),
      ("inverted", () => {
        val r = graft.operators.InvertedIndex.defaultRoot(sfDir)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
        graft.operators.InvertedIndex.buildIfMissing(spark, sfDir, r)
      }),
      ("pq", () => {
        val r = graft.operators.PqIndex.defaultRoot(sfDir)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
        graft.operators.PqIndex.buildIfMissing(spark, sfDir, r)
      })).map { case (name, build) =>
        val t0 = System.nanoTime()
        val ok =
          try { build(); true }
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(
                s"[bench] WARNING: index build '$name' failed: " +
                  s"${e.getClass.getSimpleName}: ${e.getMessage}")
              false
          }
        (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    spark.catalog.clearCache()

    // Iteration aid: SPARK_GRAFT_BENCH_ONLY="t14_tfidf_keywords,q01_..."
    // restricts the run to the named queries (full pack when unset).
    // Unknown names are called out loudly (a typo would otherwise
    // benchmark nothing and still print a plausible-looking total), and
    // a subset run marks its contract line so it can never be mistaken
    // for a full-pack attestation.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(
          s"[bench] WARNING: unknown query names ignored: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val picked = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    val subsetMark = only.fold("")(_ =>
      s""""subset":"${picked.size}/${SparkEntry.queries.size}",""")
    // Committed per-query Spark medians (tools/spark_meds.tsv, written
    // by tools/bench_compare.py in a clean window) — the reference the
    // SUSPECT guard below compares against. Only trusted when SF and
    // host both match; a new query simply has no reference row.
    val medsPath = sys.env.getOrElse(
      "SPARK_GRAFT_SPARK_MEDS", "tools/spark_meds.tsv")
    val sfName = new java.io.File(sfDir).getName
    val committedMeds: Map[String, Double] =
      try {
        // explicit UTF-8: bare `java` (the driver's launch mode) can
        // default to an ASCII charset, and a non-ASCII byte anywhere in
        // the file would throw and silently disable the guard
        val src = scala.io.Source.fromFile(medsPath, "UTF-8")
        val lines = try src.getLines().toList finally src.close()
        val okSf = lines.exists(_.trim == s"#sf\t$sfName")
        val host =
          try java.net.InetAddress.getLocalHost.getHostName
          catch { case scala.util.control.NonFatal(_) => "" }
        val okHost = host.nonEmpty &&
          lines.exists(_.trim == s"#host\t$host")
        if (!okSf || !okHost) Map.empty
        else lines.filterNot(l => l.startsWith("#") || l.trim.isEmpty)
          .flatMap { l =>
            val p = l.split('\t')
            if (p.length >= 2)
              scala.util.Try(p(0) -> p(1).toDouble).toOption
            else None
          }.toMap
      } catch { case scala.util.control.NonFatal(_) => Map.empty }

    // Settle gate (round-13 verdict item 2): the r13 driver window ran
    // at background loadavg 5-7.6 throughout and flagged 16 rows that a
    // clean window shows at normal levels. Before the timed section —
    // and again before the suspect re-measure tail below — wait
    // (bounded) for the 1-min load to drop under the target, so the
    // measurement defends itself instead of documenting contamination.
    val settleTarget = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_SETTLE_LOAD", "4.0").toDouble
    val settleWaitSec = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_SETTLE_SEC", "120").toInt
    def settle(maxWaitSec: Int): Double = {
      val deadline = System.nanoTime() + maxWaitSec * 1000000000L
      var l = loadAvg()
      while (l > settleTarget && System.nanoTime() < deadline) {
        Thread.sleep(5000)
        l = loadAvg()
      }
      l
    }
    settle(settleWaitSec)

    // PER-JOB SCHEDULING FLOOR, measured (round-16 verdict item 2): the
    // median wall time of an empty 32-task job at this master — the
    // irreducible cost every scheduled job pays before any real work.
    // The honest-cut rows are many small queries whose medians are a
    // handful of these floors; `lfl_ex_floor_adjusted` subtracts each
    // row's measured job count x this floor so the contract carries a
    // floor-normalized ratio NEXT TO the raw one, never instead of it.
    val jobFloor = {
      val reps = (1 to 15).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.parallelize(1 to cpus.toInt, cpus.toInt).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      reps(reps.length / 2)
    }

    // One query's timed-run set, sorted ascending (a failed run records
    // -1 and sorts first, poisoning the set — see below). Shared by the
    // main loop, the spread guard, and the suspect re-measure tail.
    def timedSetFor(
        name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Seq[Double], Int) = {
      var jobsMin = Int.MaxValue
      val times = (1 to runs).map { _ =>
        val j0 = jobCounter.get()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case e: Throwable =>
              System.err.println(
                s"[bench] WARNING: query '$name' failed: " +
                  s"${e.getClass.getSimpleName}: ${e.getMessage}")
              false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // MIN across runs: every warm run schedules the same structural
        // job set; a stray concurrent job can only inflate a count
        jobsMin = jobsMin.min(jobCounter.get() - j0)
        if (ok) dt else -1.0
      }.sorted
      (times, if (jobsMin == Int.MaxValue) 0 else jobsMin)
    }

    def suspectsOf(rs: Seq[BenchRow]): Seq[String] = rs.filter { r =>
      r.med >= 0 && committedMeds.get(r.name).exists(ref =>
        r.med > 2.0 * ref && r.med - ref > 0.2)
    }.map(_.name)

    val loadStart = loadAvg()
    val firstPass = picked.toSeq.sortBy(_._1).map { case (name, fn) =>
      // The warmup run is ALSO the shuffle measurement: it starts from a
      // cleared cache, so its shuffle-write bytes are the query's full
      // cold-computation traffic (later warm runs skip exchanges feeding
      // cached subtrees, which would under-report). This turns the
      // "digest-only / dimension-sized shuffles" scale claims into a
      // per-round measured number in the artifact, not prose.
      val (_, shuf) = graft.tools.ShuffleMeter.measure(spark) {
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      }
      // Per-query 1-min loadavg, sampled as this query's timed runs
      // start: the round-12 driver artifact showed the WINDOW degrading
      // exactly over the alphabetical tail, but only start/end loadavg
      // existed — which query paid for the contention was inference,
      // not record (round-12 verdict item 1).
      val qLoad = loadAvg()
      // A run that throws records -1 (not its elapsed time, which would
      // launder a crash into a plausible number); any failed run marks
      // the query -1 in the artifact and keeps it out of the total, so a
      // broken lane degrades the contract line instead of zeroing it.
      val (first, nJobs) = timedSetFor(name, fn)
      // SPREAD GUARD (round-12 verdict item 1): a query whose max/min
      // exceeds 3x (with an absolute floor so 10ms queries' GC jitter
      // doesn't trigger it) was hit by transient interference mid-set —
      // the round-12 driver artifact carried an 11x t47 spread
      // silently. Re-run the full timed set ONCE and keep the set with
      // the lower median; both medians ride the detail line so the
      // correction is auditable, never silent.
      val needsRemeasure = first.head > 0 &&
        first.last / first.head > 3.0 && first.last - first.head > 0.2
      val (times, firstMed) =
        if (!needsRemeasure) (first, None)
        else {
          val (second, _) = timedSetFor(name, fn)
          val m1 = first(first.length / 2)
          val m2 =
            if (second.head < 0) Double.MaxValue
            else second(second.length / 2)
          if (m2 < m1) (second, Some(m1)) else (first, Some(m1))
        }
      // Intra-query cache() blocks (optimizer barriers in d08/d06/t06 …)
      // are only needed within one query's execution; drain them here so
      // 70+ queries' worth of cached partitions don't pile up in executor
      // storage and evict/spill each other late in the run. Timed runs
      // still see a warm cache (the warmup pass repopulates it) — only
      // cross-QUERY retention goes away.
      spark.catalog.clearCache()
      // `times` is sorted ascending, so any failed run (-1) sorts first:
      // one failure poisons the query to (-1,-1,-1) rather than reporting
      // a min/median over a partial run set that silently hides the crash.
      val (mn, med, mx) =
        if (times.head < 0) (-1.0, -1.0, -1.0)
        else (times.head, times(times.length / 2), times.last)
      BenchRow(name, mn, med, mx, shuf.bytesWritten, qLoad, firstMed,
        nJobs)
    }
    // SUSPECT RE-MEASURE TAIL (round-13 verdict item 2): rows flagged
    // against their committed clean-window reference get ONE more full
    // timed set at the END of the pack — after a bounded settle wait —
    // where transient window contention has usually passed. The lower
    // median wins ONLY when the settle wait actually reached the load
    // target (round-14 advice item 5: an unconditional lower-of-two is
    // a best-of-two bias — a tail measured under the SAME contention
    // proves nothing, so it is discarded); a correction keeps the
    // contaminated pack-window median as `med_first` so it stays
    // auditable, never silent. A row that re-measures high is a REAL
    // regression and stays suspect.
    val packSuspects = suspectsOf(firstPass)
    val results =
      if (packSuspects.isEmpty) firstPass
      else {
        System.err.println(
          s"[bench] re-measuring ${packSuspects.size} suspect row(s) " +
            s"at end of pack: ${packSuspects.mkString(",")}")
        val settled = settle(settleWaitSec) <= settleTarget
        if (!settled) System.err.println(
          "[bench] settle wait expired above the load target — tail " +
            "medians will be measured for the log but NOT accepted")
        val byName = picked
        firstPass.map { r =>
          if (!packSuspects.contains(r.name) || r.med < 0) r
          else byName.get(r.name).fold(r) { fn =>
            // warmup repopulates the intra-query cache the pack loop
            // drained, so the tail measures the same shape as the pack
            try fn(spark, sfDir).count()
            catch { case _: Throwable => () }
            val qLoad = loadAvg()
            val (t, _) = timedSetFor(r.name, fn)
            spark.catalog.clearCache()
            val med2 = if (t.head < 0) -1.0 else t(t.length / 2)
            if (settled && med2 >= 0 && med2 < r.med)
              r.copy(mn = t.head, med = med2, mx = t.last,
                load = qLoad, firstMed = Some(r.med))
            else r
          }
        }
      }
    // MAINTENANCE ROWS ON THE CONTRACT (round-16 verdict item 1: the
    // round-16 serving shave silently made the write side costlier —
    // put the two rows that moved under the same machine-readable
    // contract as the serving rows, so a maintenance regression fails
    // as loudly as a serving one). Same shapes as graft.tools.MaintBench
    // at this sf: a 1-partition CDC batch's incremental tokenized-corpus
    // refresh, and the consumer-side change-feed step over that commit.
    // Own "_bench" roots — never the oracle gates' corpora. med/3,
    // fresh batch per run. Skipped on subset runs (SPARK_GRAFT_BENCH_ONLY)
    // so targeted A/Bs stay fast.
    val maintRows: Seq[(String, Double)] =
      if (only.nonEmpty) Nil
      else try {
        // settle before the maintenance block (round-19, r18 verdict
        // item 4): window3 of round 18 ran its maint rows right after a
        // timeout-killed bench and read mv_refresh at 6x warm; the
        // serving rows get a settle gate, so the maint rows get one too
        settle(settleWaitSec)
        import graft.lake.SnapshotTable
        import graft.operators.TokenizedCorpus
        val zb = graft.core.IndexRoot.of(sfDir, "documents.parquet",
          "graft_zipf_bench_base_v1")
        val zt = graft.core.IndexRoot.of(sfDir, "documents.parquet",
          "graft_zipf_bench_tok_v1")
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(zb))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(zt))
        graft.queries.Search.zipfTokRoot(spark, sfDir, "_bench")
        var batchId = 0L
        def onePartitionBatch(): Unit = {
          batchId += 1
          val d = spark.range(1).select(
            org.apache.spark.sql.functions.lit(8L * batchId).as("doc_id"),
            org.apache.spark.sql.functions.concat(
              org.apache.spark.sql.functions.lit("w128 w129 refreshed "),
              org.apache.spark.sql.functions.lit(batchId).cast("string"))
              .as("text"),
            org.apache.spark.sql.functions.lit("p0").as("src"))
          SnapshotTable.upsert(spark, zb, d, "doc_id", Seq("src"))
        }
        val refresh1p = (1 to 3).map { _ =>
          onePartitionBatch()
          val t0 = System.nanoTime()
          TokenizedCorpus.refresh(spark, zb, zt, Seq("src"))
          (System.nanoTime() - t0) / 1e9
        }.sorted.apply(1)
        val feedStep = (1 to 3).map { _ =>
          onePartitionBatch()
          val latest = SnapshotTable.latest(spark, zb).get
          val t0 = System.nanoTime()
          graft.lake.ChangeFeed.between(spark, zb, latest - 1, latest)
            .count()
          (System.nanoTime() - t0) / 1e9
        }.sorted.apply(1)
        // mv_refresh_1p under the contract too (round-17 verdict item
        // 3 of "what's wrong": the one maintenance row whose drift had
        // to be window-argued because nothing machine-checked it)
        import graft.lake.MaterializedAgg
        import graft.lake.MaterializedAgg.MvSpec
        val mvBase = graft.core.IndexRoot.of(sfDir, "documents.parquet",
          "graft_mv_bench_base_v1")
        val mvRoot = graft.core.IndexRoot.of(sfDir, "documents.parquet",
          "graft_mv_bench_view_v1")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(mvBase))
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(mvRoot))
        val docs = graft.core.Tables(spark, sfDir, "documents").select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang"),
          org.apache.spark.sql.functions.col("n_chars"),
          org.apache.spark.sql.functions.col("source"))
        SnapshotTable.write(spark, mvBase, docs, Seq("source"),
          lookupFor = Seq("doc_id"))
        val spec = MvSpec(Seq("source"),
          sums = Seq("total_chars" -> "n_chars"), countName = "n_docs",
          mins = Seq("min_chars" -> "n_chars"),
          maxs = Seq("max_chars" -> "n_chars"))
        MaterializedAgg.init(spark, mvBase, mvRoot, spec, nBuckets = 8)
        val src0 = docs.select(
          org.apache.spark.sql.functions.col("source"))
          .distinct().limit(1).collect().head.getString(0)
        val mvRefresh1p = (1 to 3).map { i =>
          SnapshotTable.upsert(spark, mvBase,
            spark.range(1).select(
              org.apache.spark.sql.functions
                .lit(1000000000L + i).as("doc_id"),
              org.apache.spark.sql.functions.lit("en").as("lang"),
              org.apache.spark.sql.functions.lit(i * 100L).as("n_chars"),
              org.apache.spark.sql.functions.lit(src0).as("source")),
            "doc_id", Seq("source"))
          val t0 = System.nanoTime()
          MaterializedAgg.refresh(spark, mvBase, mvRoot, spec, 8)
          (System.nanoTime() - t0) / 1e9
        }.sorted.apply(1)
        // dv_delete_1row (round 18): the merge-on-read one-row delete
        // — O(admitted files) scan + O(deleted rows) commit — belongs
        // under the contract beside the serving rows it protects
        val maxDoc = docs.select(org.apache.spark.sql.functions
          .max(org.apache.spark.sql.functions.col("doc_id")))
          .first().getLong(0)
        val dvDel1 = (1 to 3).map { i =>
          val t0 = System.nanoTime()
          SnapshotTable.deleteRowsWhere(spark, mvBase,
            org.apache.spark.sql.functions.col("doc_id") ===
              (maxDoc / 2 - i))
          (System.nanoTime() - t0) / 1e9
        }.sorted.apply(1)
        // dv_scan_part (round 19): a partition-filtered SQL scan of
        // the dv-carrying table the deletes above just left behind —
        // with DvApply's pruning-preserving split this row tracks the
        // FILTERED SLICE's cost (one directory plus the dv dirs), not
        // the whole table's; a regression back to the round-18
        // whole-table splice shows up here as a table-sized number
        val dvScanPart = {
          graft.lake.LakeCatalog.install(spark)
          graft.lake.LakeCatalog.register(spark, "dv_bench_scan", mvBase)
          (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            spark.sql("SELECT sum(n_chars) FROM lake.dv_bench_scan " +
              s"WHERE source = '$src0'").collect()
            (System.nanoTime() - t0) / 1e9
          }.sorted.apply(1)
        }
        Seq("tok_refresh_1p" -> refresh1p, "cdc_feed_step" -> feedStep,
          "mv_refresh_1p" -> mvRefresh1p, "dv_delete_1row" -> dvDel1,
          "dv_scan_part" -> dvScanPart)
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[bench] WARNING: maintenance rows failed: ${e.getMessage}")
          Seq("tok_refresh_1p" -> -1.0, "cdc_feed_step" -> -1.0,
            "mv_refresh_1p" -> -1.0, "dv_delete_1row" -> -1.0,
            "dv_scan_part" -> -1.0)
      }

    val loadEnd = loadAvg()
    // SUSPECT marker (round-12 verdict item 1): a med more than 2x its
    // committed clean-window reference (plus an absolute floor) is
    // flagged on the CONTRACT line — the consumer sees "this row is
    // load-contaminated or genuinely regressed, do not grade it as
    // clean" instead of inferring it from spread forensics.
    val suspects = suspectsOf(results)
    val failed = results.filter(_.med < 0).map(_.name)
    val total = results.map(_.med).filter(_ >= 0).sum
    val totalShuf = results.map(_.shuf).sum
    val sf = sfName

    // Like-for-like accountability (round-9 verdict item 6): the
    // ex-graph ratio vs the DuckDB oracle used to live only in
    // BENCH_NOTES prose, so cross-round drift was a footnote. The
    // Spark-side ex-graph total always rides the contract line; when a
    // committed DuckDB baseline for THIS sf exists
    // (tools/duckdb_baseline.tsv, written by tools/bench_compare.py —
    // per-query oracle medians on this machine), the ratio itself does
    // too, over exactly the queries present in both. d12/d17/d19 are
    // excluded as the three iterative-graph queries whose recursive-CTE
    // oracles measure a different algorithm, not the same work.
    val graphQueries =
      Set("d12_dup_clusters", "d17_dup_rate_by_source", "d19_dup_pagerank")
    val exGraph = results.filter(r => !graphQueries(r.name) && r.med >= 0)
    val totalExGraph = exGraph.map(_.med).sum
    // Honest-cut sets (round-14 verdict item 5): the headline
    // like_for_like needs no prose to interpret once the contract also
    // carries the cut that removes its two composition artifacts —
    //  - minhashFamily: the 8 rows whose DuckDB side walks the SlotC2
    //    128-bit hash math as an interpreted expression tree (d04:
    //    42 s for what Spark codegens in 0.4 s) — those rows compare
    //    evaluator architectures, not engine throughput;
    //  - platformFloor: lakehouse-semantics gates whose Spark side
    //    replays real machinery (manifest round-trips, EXCEPT ALL
    //    version diffs, OCC guards) while the oracle is a trivial
    //    rollup over pre-mutated parquet — a 0.1-1.4 s fixed floor
    //    divided by a 0.01-0.06 s rollup is not a throughput ratio,
    //    and SCALING.md's decade tables show the floor flat across
    //    100x data.
    // `lfl_ex_family` excludes both sets; `median_ratio` is the
    // per-query median over the SAME overlap like_for_like sums —
    // robust to any single row's composition. The full exclusion
    // lists ride the detail line (`lfl_exclusions`), so the artifact
    // names exactly what each cut removed.
    val minhashFamily = Set(
      "d03_minhash_sig", "d04_lsh_pairs", "d07_source_minhash",
      "d12_dup_clusters", "d13_containment", "d15_lsh_probe",
      "d17_dup_rate_by_source", "d19_dup_pagerank")
    val platformFloor = Set(
      "q63_rbac_roles", "t37_train_shuffle", "t40_snapshot_cdc",
      "t41_snapshot_skipread", "t42_bpe_encode_ranks",
      "t43_incremental_mv", "t44_snapshot_optimize",
      "t45_incremental_mv_minmax", "t48_lake_sql", "t49_mv_distinct",
      "t51_change_feed", "t52_sql_merge", "t53_meta_agg", "t54_sql_ddl",
      "t55_sql_constraints", "t56_lane_read", "t57_dv_delete")
    val baselinePath = sys.env.getOrElse(
      "SPARK_GRAFT_DUCKDB_BASELINE", "tools/duckdb_baseline.tsv")
    // (ratio, overlap count, same host?) — a baseline produced on a
    // DIFFERENT machine still yields a ratio, but the contract line
    // labels it cross_machine_ratio instead of like_for_like (ADVICE
    // r10 item 4: a fixed-baseline ratio only normalizes load drift
    // when both sides ran on the same hardware). An untagged
    // (pre-#host) baseline counts as unknown -> cross-machine.
    // baselineGen (round-12 verdict item 7): a short content hash of
    // the baseline's data rows rides the contract line, so two rounds'
    // ratios are machine-checkably same-denominator — like_for_like
    // swung 1.51 -> 0.36 across a baseline regeneration with nothing
    // in the artifacts saying "different denominator". When the tsv's
    // recorded `#gen` header disagrees with the recomputed hash (a
    // hand-edited baseline), the ratio is DROPPED and the field says
    // "mismatch" — same spirit as the host check.
    val (likeForLike, exFamilyCut, exFamilyCutAdj, medianRatio,
        baselineGen):
        (Option[(Double, Int, Boolean)], Option[(Double, Int)],
          Option[Double], Option[Double], Option[String]) =
      try {
        val src = scala.io.Source.fromFile(baselinePath, "UTF-8")
        val lines =
          try src.getLines().toList finally src.close()
        val dataLines = lines
          .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
        val gen = {
          val md = java.security.MessageDigest.getInstance("SHA-256")
          md.update(dataLines.mkString("\n").getBytes("UTF-8"))
          md.digest().take(6).map(b => f"$b%02x").mkString
        }
        val recordedGen = lines.collectFirst {
          case l if l.startsWith("#gen\t") => l.stripPrefix("#gen\t").trim
        }
        val baseSf = lines.collectFirst {
          case l if l.startsWith("#sf\t") => l.stripPrefix("#sf\t").trim
        }
        val baseHost = lines.collectFirst {
          case l if l.startsWith("#host\t") => l.stripPrefix("#host\t").trim
        }
        val thisHost =
          try java.net.InetAddress.getLocalHost.getHostName
          catch { case scala.util.control.NonFatal(_) => "" }
        val sameHost = baseHost.contains(thisHost) && thisHost.nonEmpty
        if (recordedGen.exists(_ != gen))
          (None, None, None, None, Some("mismatch"))
        else if (!baseSf.contains(sf)) (None, None, None, None, Some(gen))
        else {
          val base = dataLines
            .flatMap { l =>
              val p = l.split('\t')
              if (p.length >= 2)
                scala.util.Try(p(0) -> p(1).toDouble).toOption
              else None
            }.toMap
          val overlap = exGraph.filter(r => base.contains(r.name))
          val dd = overlap.map(r => base(r.name)).sum
          val ratio =
            if (overlap.nonEmpty && dd > 0)
              Some((overlap.map(_.med).sum / dd, overlap.size, sameHost))
            else None
          val exFam = overlap.filterNot(r =>
            minhashFamily(r.name) || platformFloor(r.name))
          val ddEx = exFam.map(r => base(r.name)).sum
          val exCut =
            if (exFam.nonEmpty && ddEx > 0)
              Some((exFam.map(_.med).sum / ddEx, exFam.size))
            else None
          val exCutAdj =
            if (exFam.nonEmpty && ddEx > 0)
              Some(exFam.map(r =>
                math.max(0.0, r.med - r.nJobs * jobFloor)).sum / ddEx)
            else None
          val perQuery = overlap
            .filter(r => base(r.name) > 0)
            .map(r => r.med / base(r.name)).sorted
          val med =
            if (perQuery.isEmpty) None
            else if (perQuery.size % 2 == 1)
              Some(perQuery(perQuery.size / 2))
            else Some((perQuery(perQuery.size / 2 - 1) +
              perQuery(perQuery.size / 2)) / 2.0)
          (ratio, exCut, exCutAdj, med, Some(gen))
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          (None, None, None, None, None)
      }

    // number formatting for the compact line: 2dp, trailing zeros trimmed.
    // Locale.ROOT — a comma-decimal default locale would break the JSON.
    def fmt(v: Double): String = {
      val s = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse
        .stripSuffix(".")
      else s
    }
    // Detail line: full-precision per-query spread. min≈median with a
    // spiked max = one contaminated run; median≫min = sustained
    // interference or a genuinely expensive plan (cross-check the
    // per-query `load`). `med_first` appears only on spread-guard
    // re-measured rows: the contaminated first median, kept auditable.
    val detail = results.map { r =>
      val extra = r.firstMed.fold("")(m => s""","med_first":$m""")
      "\"" + r.name +
        s"""":{"min":${r.mn},"med":${r.med},"max":${r.mx},""" +
        s""""shuffle_bytes":${r.shuf},"jobs":${r.nJobs},""" +
        s""""load":${r.load}$extra}"""
    }.mkString("{", ",", "}")
    val ib = indexBuilds.map { case (n, s) => "\"" + n + s"""":$s""" }
      .mkString("{", ",", "}")
    // names behind every like_for_like cut — the artifact, not prose,
    // says what lfl_ex_family removed
    val exclusions = {
      def arr(s: Set[String]) =
        s.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      s""""lfl_exclusions":{"graph":${arr(graphQueries)},""" +
        s""""minhash_family":${arr(minhashFamily)},""" +
        s""""platform_floor":${arr(platformFloor)}}"""
    }
    // maint rows at FULL precision on the detail line: the contract
    // line rounds through fmt() (2 dp), and the committed maint:
    // guard references must not inherit that rounding (round-19
    // review finding — a sub-0.005 s row would store ref 0.0 and
    // collapse the 3x guard to its absolute floor)
    val maintDetail =
      if (maintRows.isEmpty) ""
      else maintRows.map { case (n, v) => "\"" + n + "\":" + v }
        .mkString(""""maint":{""", ",", "},")
    val detailLine =
      s"""{"metric":"total_detail","value":$total,"unit":"sec","runs":$runs,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"shuffle_bytes":$totalShuf,"index_build":$ib,$maintDetail$exclusions,"queries":$detail,"sf":"$sfDir"}"""
    println(detailLine)
    // Contract line: bounded by construction — 10 slowest medians only
    // (the plausible-regression set), never the full pack.
    val slowest = results.filter(_.med >= 0).sortBy(-_.med).take(10)
      .map(r => "\"" + r.name + "\":" + fmt(r.med))
      .mkString("{", ",", "}")
    // suspect list: bounded (10 names) like failed_names; ALWAYS
    // present — "suspect":[] is the attestation that the guard ran and
    // found nothing, absence would be indistinguishable from an old
    // binary. Suffixed with +N when truncated.
    val suspectMark = {
      val names = suspects.take(10).map("\"" + _ + "\"")
      val over = if (suspects.size > 10)
        s""","+${suspects.size - 10} more"""" else ""
      s""""suspect":${names.mkString("[", ",", "")}$over],""" +
        // reference COVERAGE of the per-query guard only: the maint:
        // rows feed the maint guard, not suspectsOf — counting them
        // here would let a meds file that lost query rows still read
        // as fully covered (round-19 review finding)
        s""""suspect_ref_n":${
          committedMeds.count(m => !m._1.startsWith("maint:"))},""" +
        s""""remeasured":${packSuspects.size},"""
    }
    // `failed` is an AGGREGATE marker: a consumer reading only the
    // contract line sees a degraded run as failed>0 + names, instead of
    // having to notice that the total quietly covers fewer queries.
    val failedMark =
      if (failed.isEmpty) s""""failed":0,"""
      else {
        val names = failed.take(10).map("\"" + _ + "\"").mkString("[", ",", "]")
        s""""failed":${failed.size},"failed_names":$names,"""
      }
    // Full spread ALSO goes to a PER-RUN file, so the complete artifact
    // survives even if a build tool truncates or prefixes stdout. Not a
    // fixed shared path (/tmp/graft_bench.json clobbered concurrent runs'
    // attestations, and a pre-planted symlink there would redirect the
    // write): SPARK_GRAFT_BENCH_OUT if the caller wants a known location,
    // else a fresh temp file. The path is resolved BEFORE the contract
    // line is built so the contract can carry it. NonFatal, not just
    // IOException: Paths.get on a malformed SPARK_GRAFT_BENCH_OUT throws
    // unchecked InvalidPathException, and the contract line must print
    // regardless of artifact-write failure.
    val benchFile: Option[java.nio.file.Path] =
      try Some(sys.env.get("SPARK_GRAFT_BENCH_OUT")
        .map(java.nio.file.Paths.get(_))
        .getOrElse(java.nio.file.Files.createTempFile("graft_bench_", ".json")))
      catch { case scala.util.control.NonFatal(_) => None }
    // JSON-escape the path (quotes/backslashes/control chars) so the
    // contract line stays machine-parseable for any env value.
    val benchFileMark = benchFile.fold("") { p =>
      val escaped = p.toString.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      s""""bench_file":"$escaped","""
    }
    // index builds ride the CONTRACT line too (3 numbers, bounded): a
    // build regression must be visible to a consumer reading only the
    // bounded tail, not just the detail line
    val ibShort = indexBuilds.map { case (n, s) => "\"" + n + "\":" + fmt(s) }
      .mkString("{", ",", "}")
    // MAINT CONTAMINATION GUARD (round-19, r18 verdict item 4): a maint
    // row reading > 3x its committed clean-window reference
    // (spark_meds.tsv `maint:<name>` rows, same sf + host) names itself
    // on the contract line — the round-18 window3 exclusion
    // (mv_refresh 19.4 s, 6x warm, hand-adjudicated) is now machine-
    // made: a consumer refuses the window's maint rows when
    // maint_suspect is non-empty instead of reading a 6x number as a
    // regression. "maint_suspect":[] is the attestation the guard ran.
    val maintSuspects = maintRows.collect {
      case (n, v) if v >= 0 && committedMeds.get(s"maint:$n")
        .exists(ref => v > 3.0 * ref && v - ref > 0.2) => n
    }
    val maintMark =
      if (maintRows.isEmpty) ""
      else maintRows.map { case (n, v) => "\"" + n + "\":" + fmt(v) }
        .mkString(""""maint":{""", ",", "},") +
        s""""maint_suspect":${maintSuspects.map("\"" + _ + "\"")
          .mkString("[", ",", "]")},"""
    val lflMark = likeForLike.fold("") { case (ratio, n, sameHost) =>
      val field = if (sameHost) "like_for_like" else "cross_machine_ratio"
      // the honest cut and the per-query median ride NEXT TO the
      // headline: the exclusion-list names are on the detail line
      val exMark = exFamilyCut.fold("") { case (r, en) =>
        s""""lfl_ex_family":${fmt(r)},"lfl_ex_family_n":$en,""" }
      val exAdjMark = exFamilyCutAdj.fold("")(r =>
        s""""lfl_ex_floor_adjusted":${fmt(r)},""" +
          s""""job_floor":${String.format(java.util.Locale.ROOT,
            "%.4f", Double.box(jobFloor))},""")
      val medMark = medianRatio.fold("")(m =>
        s""""median_ratio":${fmt(m)},""")
      s""""$field":${fmt(ratio)},"${field}_n":$n,$exMark$exAdjMark$medMark"""
    }
    val genMark = baselineGen.fold("")(g => s""""baseline_gen":"$g",""")
    // FLAT per-query medians on the contract line (round 20, r19
    // verdict item 7): the driver's scaling contract reads a
    // `"queries":{name: seconds}` map off the one total line — the
    // nested detail-line spread never matched that shape, so the
    // driver's PERF scaling block came up empty every round
    // (`per_query: {}` in PERF_r19). ADDITIONS-ONLY measurement fix:
    // no timed region changed, every existing field (including the
    // detail line's rich per-query objects and the bounded `slowest`)
    // stays; the contract line grows to ~5 KB, which the per-run
    // bench_file and full-stdout parsing carry even where a bounded
    // log tail would clip the head. 3-dp medians: enough for any
    // cross-core-count ratio, half the bytes of full precision.
    def fmt3(v: Double): String = {
      val s = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse
        .stripSuffix(".")
      else s
    }
    val flatQueries = results.map(r => "\"" + r.name + "\":" + fmt3(r.med))
      .mkString("{", ",", "}")
    val contract =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"cpus":$cpus,$failedMark$subsetMark$suspectMark"total_ex_graph":${fmt(totalExGraph)},$lflMark$genMark"loadavg_start":${fmt(loadStart)},"loadavg_end":${fmt(loadEnd)},$benchFileMark$maintMark"index_build":$ibShort,"slowest":$slowest,"queries":$flatQueries,"sf":"$sf"}"""
    // The file carries BOTH lines (full spread + contract) — it is the
    // complete artifact; stdout's bounded tail only needs the contract.
    benchFile.foreach { out =>
      try java.nio.file.Files.write(
        out, (detailLine + "\n" + contract + "\n").getBytes("UTF-8"))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    println(contract) // the contract line — keep LAST and compact
    spark.stop()
  }
}
