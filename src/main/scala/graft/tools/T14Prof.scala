package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage/variant breakdown for t14_tfidf_keywords (round-18 verdict
  * item 2: a slowest-10 resident since round 5 whose second was never
  * pinned — tokenize? per-doc top-3 window? df join?). Times each
  * suspect in isolation on the same corpus:
  *
  *  - scan:      documents scan + fanOut + count (the floor)
  *  - toks:      regexp tokenize + explode, count only
  *  - tf:        toks + (doc, tok) hash aggregate (the tf stage)
  *  - dfwin:     tf + df count-window over tok (adds one shuffle)
  *  - full:      the shipped t14 end to end (adds idf math + per-doc
  *               top-3 window + final sort)
  *  - tf_served: the same (doc, tok, tf) rows READ from the pristine
  *               tokenized corpus ([[graft.queries.Search
  *               .pristineTokRoot]] — postings already materialized)
  *  - full_served: t14's df/idf/top-3 tail over the served tf rows —
  *               the candidate fix (rides the table its BM25 siblings
  *               ride; build cost is excluded, matching how
  *               t46/t50 account theirs)
  *
  * Prints one JSON line plus the scheduled-job count of one full run
  * (the t36 anatomy: jobs x ~0.02 s local[32] floor explains small
  * queries). Usage: graft.tools.T14Prof <sfDir>
  */
object T14Prof {
  private def med3(body: => Unit): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime(); body
      (System.nanoTime() - t0) / 1e9
    }.sorted.apply(1)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args(0)
    import graft.core.Tables

    val docs = Tables(spark, sfDir, "documents").transform(Tables.fanOut)
    docs.count() // warm footer caches

    val scan = med3 { docs.count(); () }

    val toksDf = docs.select(col("doc_id"),
      explode(expr(graft.queries.Text.toksExpr)).as("tok"))
    val toks = med3 { toksDf.count(); () }

    val tfDf = toksDf.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val tf = med3 { tfDf.count(); () }

    val dfwin = med3 {
      tfDf.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("tok")))).count(); ()
    }

    val full = med3 {
      graft.queries.Text.t14_tfidf_keywords.run(spark, sfDir).collect(); ()
    }

    // served variants: postings already materialized (warm the root
    // first so the refresh/no-op check is outside the measurement)
    val tokRoot = graft.queries.Search.pristineTokRoot(spark, sfDir)
    val served = graft.operators.TokenizedCorpus.postings(spark, tokRoot)
      .select(col("doc_id"), col("tok"), col("tf"))
    served.count()
    val tfServed = med3 { served.count(); () }

    def fullServedOnce(): Unit = {
      val nDocs = graft.operators.TokenizedCorpus
        .corpusStats(spark, tokRoot).select(col("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_n9").desc, col("tok"))
      served
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("tok"))))
        .crossJoin(broadcast(nDocs))
        .withColumn("idf_n9",
          expr(graft.core.Exact.mitchellLog2n9("n_docs", "df")))
        .withColumn("score_n9", col("tf") * col("idf_n9"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("tok"), col("tf"),
          round(col("score_n9").cast("double") / 1000000000.0, 6)
            .as("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
        .collect()
      ()
    }
    fullServedOnce()
    val fullServed = med3 { fullServedOnce() }

    // job anatomy of one full run
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    graft.queries.Text.t14_tfidf_keywords.run(spark, sfDir).collect()
    spark.sparkContext.removeSparkListener(listener)

    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"t14prof","scan":${f(scan)},""" +
      s""""toks":${f(toks)},"tf":${f(tf)},"dfwin":${f(dfwin)},""" +
      s""""full":${f(full)},"tf_served":${f(tfServed)},""" +
      s""""full_served":${f(fullServed)},"jobs_full":$jobs}""")
    spark.stop()
  }
}
