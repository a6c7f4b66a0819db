package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage breakdown of the t35 inline batched-BM25 pipeline — the
  * reproducible measurement behind BENCH_NOTES' "where does t35's time
  * go" table (round-14 verdict item 6) — and, since round 16, of the
  * t47 tokenize-once batch path (round-15 verdict item 2: name where
  * t47's second lands). Stages are timed CUMULATIVELY (each stage
  * includes its prefix, so adjacent deltas are the stage costs) on a
  * fresh cache per run, median of 3:
  *
  * t35 (inline):
  *   tok_cache   tokenize the corpus (regexp_extract_all) + cache.count
  *   postings    explode + qterm semi-join + (doc, tok) tf aggregate
  *   exact_score the full t35: df stats + query join + DECIMAL(38,0)
  *               ladder + native per-query top-k
  *   fast_score  same pipeline with the double fast path (rank-equal)
  *
  * t47 (tokenize-once, served from the persisted postings + df tables):
  *   setup          refresh no-op check + workload term collect
  *   df_read        + per-term df from the materialized df table
  *   postings_read  + stats-pruned postings read (single consumer —
  *                  no cache barrier since round 16)
  *   exact_full     the full t47: query join + DECIMAL ladder +
  *                  native per-query top-k + final order
  *   fast_full      same with the double fast path (rank-equal)
  *
  * Usage: graft.tools.RetrievalProf <sfDir>
  */
object RetrievalProf {
  private def med3(spark: SparkSession)(body: => Long): (Double, Long) = {
    val rs = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (rs.map(_._1).sorted.apply(1), rs.head._2)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Search

    def docs = graft.core.Tables(spark, sfDir, "documents")
    val queries = Search.bm25BatchQueriesDf(spark)
    val q = queries.select(col("query_id"), col("tok")).distinct()
    val qterms = q.select(col("tok")).distinct()

    def base = Search.tokenized(docs)
      .select(col("doc_id"), col("dl"), col("toks")).cache()
    def postingsOf(b: org.apache.spark.sql.DataFrame) = b
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .join(broadcast(qterms), "tok")
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))

    // warm the JIT + file listings once
    Search.bm25BatchOver(docs, queries, Search.Bm25BatchK).count()

    val (tokS, nDocs) = med3(spark) { base.count() }
    val (postS, nPost) = med3(spark) {
      val b = base
      b.count() // materialize the shared cache exactly like t35 does
      postingsOf(b).count()
    }
    val (exactS, _) = med3(spark) {
      Search.bm25BatchOver(docs, queries, Search.Bm25BatchK).count()
    }
    val (fastS, _) = med3(spark) {
      Search.bm25BatchFastOver(docs, queries, Search.Bm25BatchK).count()
    }
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(
      s"""{"metric":"t35_stages","sf":"${new java.io.File(sfDir).getName}",""" +
      s""""tok_cache":${f(tokS)},"postings_cum":${f(postS)},""" +
      s""""exact_full":${f(exactS)},"fast_full":${f(fastS)},""" +
      s""""n_docs":$nDocs,"n_postings":$nPost}""")

    // ---- t47: the tokenize-once batch path -------------------------
    import graft.operators.TokenizedCorpus
    val tokRoot = Search.pristineTokRoot(spark, sfDir) // built/refreshed
    val (setupS, nTerms) = med3(spark) {
      Search.pristineTokRoot(spark, sfDir)
      q.select(col("tok")).distinct().collect().length.toLong
    }
    val terms = q.select(col("tok")).distinct()
      .collect().map(_.getString(0)).toSeq
    val (dfS, _) = med3(spark) {
      Search.pristineTokRoot(spark, sfDir)
      TokenizedCorpus.dfForTerms(spark, tokRoot, terms).count()
    }
    val (readS, nPruned) = med3(spark) {
      Search.pristineTokRoot(spark, sfDir)
      TokenizedCorpus.dfForTerms(spark, tokRoot, terms).count()
      TokenizedCorpus.postingsForTerms(spark, tokRoot, terms)
        .select(col("doc_id"), col("dl"), col("tok"), col("tf")).count()
    }
    val (t47ExactS, _) = med3(spark) {
      Search.bm25BatchFromTokenized(spark, tokRoot, queries,
        Search.Bm25BatchK).count()
    }
    val (t47FastS, _) = med3(spark) {
      Search.bm25BatchFromTokenizedFast(spark, tokRoot, queries,
        Search.Bm25BatchK).count()
    }
    println(
      s"""{"metric":"t47_stages","sf":"${new java.io.File(sfDir).getName}",""" +
      s""""setup":${f(setupS)},"df_read_cum":${f(dfS)},""" +
      s""""postings_read_cum":${f(readS)},"exact_full":${f(t47ExactS)},""" +
      s""""fast_full":${f(t47FastS)},"n_terms":$nTerms,""" +
      s""""n_pruned_postings":$nPruned}""")

    // ---- t36: index-served batched probe, job-level anatomy --------
    // (round-16 verdict item "what's wrong" 3: name the residual job
    // structure behind t36's ~0.7 s.) A JobListener records every
    // scheduled job of one memo-warm probeBatch call — the per-job
    // floors ARE the residual, so the honest fix target is job COUNT,
    // not any single stage.
    import graft.operators.InvertedIndex
    val idxRoot = InvertedIndex.defaultRoot(sfDir)
    InvertedIndex.buildIfMissing(spark, sfDir, idxRoot)
    InvertedIndex.probeBatch(spark, idxRoot, queries,
      Search.Bm25BatchK).count() // warm memo + JIT
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val starts =
        new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(s.jobId, (System.nanoTime(),
          Option(s.properties)
            .map(_.getProperty("spark.job.description", "")).getOrElse("")))
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = starts.remove(e.jobId)
        if (st != null)
          jobs.add((e.jobId, System.nanoTime() - st._1, st._2))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    InvertedIndex.probeBatch(spark, idxRoot, queries,
      Search.Bm25BatchK).count()
    val wallS = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // let the listener bus drain the last JobEnd
    spark.sparkContext.removeSparkListener(listener)
    val (t36S, _) = med3(spark) {
      InvertedIndex.probeBatch(spark, idxRoot, queries,
        Search.Bm25BatchK).count()
    }
    val (t36FastS, _) = med3(spark) {
      InvertedIndex.probeBatchFast(spark, idxRoot, queries,
        Search.Bm25BatchK).count()
    }
    import scala.jdk.CollectionConverters._
    val jobList = jobs.asScala.toSeq.sortBy(_._1)
      .map { case (id, ns, _) => s""""job$id":${f(ns / 1e9)}""" }
    println(
      s"""{"metric":"t36_jobs","sf":"${new java.io.File(sfDir).getName}",""" +
      s""""wall":${f(wallS)},"n_jobs":${jobList.size},""" +
      s""""exact_med3":${f(t36S)},"fast_med3":${f(t36FastS)},""" +
      jobList.mkString(",") + "}")
    spark.stop()
  }
}
