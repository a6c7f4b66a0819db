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
  * Output: a human-readable full-precision detail line first, then ONE
  * compact JSON line LAST. The compact line keeps itself small (values
  * rounded to 2 decimals, trailing zeros trimmed, sf as basename) so the
  * whole object fits inside the driver's bounded stdout tail even with a
  * build-tool epilogue after it — that is what makes the artifact
  * machine-parseable rather than a truncated fragment.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
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
    val results = picked.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warm
      // A run that throws records -1 (not its elapsed time, which would
      // launder a crash into a plausible number); any failed run marks
      // the query -1 in the artifact and keeps it out of the total, so a
      // broken lane degrades the contract line instead of zeroing it.
      val times = (1 to runs).map { _ =>
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
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }.sorted
      // Intra-query cache() blocks (optimizer barriers in d08/d06/t06 …)
      // are only needed within one query's execution; drain them here so
      // 70+ queries' worth of cached partitions don't pile up in executor
      // storage and evict/spill each other late in the run. Timed runs
      // still see a warm cache (the warmup pass repopulates it) — only
      // cross-QUERY retention goes away.
      spark.catalog.clearCache()
      val median =
        if (times.head < 0) -1.0 else times(times.length / 2)
      name -> median
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val sf = new java.io.File(sfDir).getName

    // number formatting for the compact line: 2dp, trailing zeros trimmed.
    // Locale.ROOT — a comma-decimal default locale would break the JSON.
    def fmt(v: Double): String = {
      val s = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse
        .stripSuffix(".")
      else s
    }
    val detail = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total_detail","value":$total,"unit":"sec","runs":$runs,"queries":$detail,"sf":"$sfDir"}""")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val contract =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$subsetMark"queries":$qs,"sf":"$sf"}"""
    // ... also to a PER-RUN file, so the artifact stays machine-parseable
    // even if a build tool truncates or prefixes stdout. Not a fixed
    // shared path (/tmp/graft_bench.json clobbered concurrent runs'
    // attestations, and a pre-planted symlink there would redirect the
    // write): SPARK_GRAFT_BENCH_OUT if the caller wants a known location,
    // else a fresh temp file, path announced next to the contract line.
    // NonFatal, not just IOException: Paths.get on a malformed
    // SPARK_GRAFT_BENCH_OUT throws unchecked InvalidPathException, and the
    // contract line below must print regardless of artifact-write failure.
    try {
      val out = sys.env.get("SPARK_GRAFT_BENCH_OUT")
        .map(java.nio.file.Paths.get(_))
        .getOrElse(java.nio.file.Files.createTempFile("graft_bench_", ".json"))
      java.nio.file.Files.write(out, (contract + "\n").getBytes("UTF-8"))
      // JSON-escape the path (quotes/backslashes/control chars) so the
      // announcement line stays machine-parseable for any env value.
      val escaped = out.toString.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      println(s"""{"metric":"bench_file","path":"$escaped"}""")
    } catch { case scala.util.control.NonFatal(_) => () }
    println(contract) // the contract line — keep LAST and compact
    spark.stop()
  }
}
