package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: warm-run sub-piece timings of the t47 path. */
object T47Warm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Search
    import graft.operators.TokenizedCorpus
    val tokRoot = Search.pristineTokRoot(spark, sfDir)
    val queries = Search.bm25BatchQueriesDf(spark)
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    Search.bm25BatchFromTokenized(spark, tokRoot, queries, 5).count()
    for (i <- 1 to 2) {
      println(s"--- warm iter $i ---")
      t("refresh_noop") { Search.pristineTokRoot(spark, sfDir) }
      val q = queries.select(col("query_id"), col("tok")).distinct()
      val terms = t("terms_collect") {
        q.select(col("tok")).distinct().collect().map(_.getString(0)).toSeq }
      val corpus = TokenizedCorpus.corpusStats(spark, tokRoot)
      t("corpus_collect") { corpus.collect() }
      val dfStats = t("df_plan") {
        TokenizedCorpus.dfForTerms(spark, tokRoot, terms) }
      t("df_collect") { dfStats.collect() }
      val postings = t("postings_plan") {
        TokenizedCorpus.postingsForTerms(spark, tokRoot, terms)
          .select(col("doc_id"), col("dl"), col("tok"), col("tf")).cache() }
      t("postings_warmhit_count") { postings.count() }
      t("score_only") {
        Search.bm25ScoreBatch(postings, q, dfStats, corpus, 5).count() }
      t("full_query") {
        Search.bm25BatchFromTokenized(spark, tokRoot, queries, 5).count() }
    }
    spark.stop()
  }
}
