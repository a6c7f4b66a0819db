package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off measurement main for BENCH_NOTES: the float BM25 fast path
  * vs the oracle-gated exact-integer path, warm medians at the given
  * SF — the number behind the "fast path ≤ 2x DuckDB" accountability
  * row (round-10 verdict item 5). */
object Bm25FastBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val q = graft.queries.Search.bm25BatchQueriesDf(spark)
    val k = graft.queries.Search.Bm25BatchK
    def med(f: => Long): Double = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    val exactBatch = med(
      graft.queries.Search.bm25BatchOver(docs, q, k).count())
    val fastBatch = med(
      graft.queries.Search.bm25BatchFastOver(docs, q, k).count())
    val exactInline = med(graft.queries.Search.t31_bm25.run(spark, sfDir).count())
    val fastInline = med(graft.queries.Search.bm25Fast(docs).count())
    val root = graft.operators.InvertedIndex.defaultRoot(sfDir)
    graft.operators.InvertedIndex.buildIfMissing(spark, sfDir, root)
    val exactProbe = med(graft.operators.InvertedIndex
      .probeBatch(spark, root, q, k).count())
    val fastProbe = med(graft.operators.InvertedIndex
      .probeBatchFast(spark, root, q, k).count())
    println(f"""{"metric":"bm25_fast","sf":"$sfDir","batch_exact":$exactBatch%.3f,"batch_fast":$fastBatch%.3f,"inline_exact":$exactInline%.3f,"inline_fast":$fastInline%.3f,"probe_batch_exact":$exactProbe%.3f,"probe_batch_fast":$fastProbe%.3f}""")
    spark.stop()
  }
}
