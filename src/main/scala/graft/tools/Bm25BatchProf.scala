package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the batched-BM25 shuffle shape (round 20, r19
  * verdict item 6): the score aggregate groupBy(query_id, doc_id) pays
  * its own full exchange after the postings exchange. Candidate: ONE
  * explicit repartition by doc_id up front — hash(doc_id) satisfies
  * the clustered distribution of BOTH the postings aggregate
  * (doc_id, dl, tok) and the score aggregate (query_id, doc_id), so
  * every downstream aggregate runs exchange-free. Times + shuffle
  * bytes per variant, bench cache protocol. Throwaway diagnostics.
  * Usage: runMain graft.tools.Bm25BatchProf <sfDir> [reps]
  */
object Bm25BatchProf {
  private def run(
      spark: SparkSession, name: String, reps: Int)(
      f: () => DataFrame): Unit = {
    val (_, shuf) = ShuffleMeter.measure(spark) { f().count() } // cold
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f().count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    spark.catalog.clearCache()
    println(f"[bm25prof] $name%-16s med=${times(times.length / 2)}%.2fs " +
      f"min=${times.head}%.2f shuffle=${shuf.bytesWritten / 1024}%dKB " +
      s"recs=${shuf.recordsWritten}")
  }

  // inline t35 shape with a doc_id repartition before the postings agg
  private def inlineRepart(docs: DataFrame): DataFrame = {
    import graft.queries.Search._
    val queries = bm25BatchQueriesDf(docs.sparkSession)
    val q = queries.select(col("query_id"), col("tok")).distinct()
    val terms = workloadTerms(queries)
    val base = tokenized(docs)
      .select(col("doc_id"), col("dl"), col("toks"))
      .cache()
    val corpus = base.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val postings = base
      .select(col("doc_id"), col("dl"),
        explode(filter(col("toks"), _.isin(terms: _*))).as("tok"))
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .cache()
    val dfStats = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    bm25ScoreBatch(postings, q, dfStats, corpus, Bm25BatchK)
  }

  // t36/t47 shape: postings precomputed (index/tokenized corpus),
  // repartition by doc_id before scoring
  private def servedRepart(
      spark: SparkSession, postings: DataFrame, queries: DataFrame,
      dfStats: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.queries.Search._
    bm25ScoreBatch(postings.repartition(col("doc_id")),
      queries.select(col("query_id"), col("tok")).distinct(),
      dfStats, corpus, Bm25BatchK)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    import graft.queries.Search
    val docs = graft.core.Tables(spark, dir, "documents")

    if (sys.env.get("BM25PROF_PLAN").contains("1")) {
      val invRoot0 = graft.operators.InvertedIndex.defaultRoot(dir)
      graft.operators.InvertedIndex.buildIfMissing(spark, dir, invRoot0)
      def dump(tag: String, df: DataFrame): Unit = {
        df.queryExecution.toRdd.count()
        println(s"=== $tag ===")
        println(df.queryExecution.executedPlan.toString)
      }
      dump("t36_current", graft.SparkEntry
        .queries("t36_bm25_batch_probe")(spark, dir))
      dump("t36_repart", graft.operators.InvertedIndex
        .probeBatchRepartForProf(spark, invRoot0,
          Search.bm25BatchQueriesDf(spark), Search.Bm25BatchK))
      spark.stop(); return
    }

    run(spark, "t35_current", reps)(() =>
      graft.SparkEntry.queries("t35_bm25_batch")(spark, dir))
    run(spark, "t35_repart", reps)(() => inlineRepart(docs))

    val invRoot = graft.operators.InvertedIndex.defaultRoot(dir)
    graft.operators.InvertedIndex.buildIfMissing(spark, dir, invRoot)
    run(spark, "t36_current", reps)(() =>
      graft.SparkEntry.queries("t36_bm25_batch_probe")(spark, dir))
    run(spark, "t36_repart", reps)(() =>
      graft.operators.InvertedIndex.probeBatchRepartForProf(
        spark, invRoot, Search.bm25BatchQueriesDf(spark),
        Search.Bm25BatchK))

    val tokRoot = Search.pristineTokRoot(spark, dir)
    run(spark, "t47_current", reps)(() =>
      graft.SparkEntry.queries("t47_bm25_batch_tokenized")(spark, dir))
    run(spark, "t47_repart", reps)(() => {
      // repartition INSIDE the cache: the exchange is the one-time
      // cache fill; every warm consumer reads doc_id-partitioned
      // postings and the score aggregate runs exchange-free
      import graft.operators.TokenizedCorpus
      val queries = Search.bm25BatchQueriesDf(spark)
      val terms = Search.workloadTerms(queries)
      val corpus = TokenizedCorpus.corpusStats(spark, tokRoot).cache()
      val dfStats = TokenizedCorpus.dfForTerms(spark, tokRoot, terms).cache()
      val postings = TokenizedCorpus.postingsForTerms(spark, tokRoot, terms)
        .select(col("doc_id"), col("dl"), col("tok"), col("tf"))
        .repartition(col("doc_id"))
        .cache()
      Search.bm25ScoreBatch(postings,
        queries.select(col("query_id"), col("tok")).distinct(),
        dfStats, corpus, Search.Bm25BatchK)
    })
    spark.stop()
  }
}
