package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Stage/variant breakdown for s09_pq_ann (round-18 verdict item 2:
  * slowest-10 since round 6, jobs never named). The query has four
  * separable costs; each is timed in isolation on the same corpus:
  *
  *  - scan:    embeddings scan + count (the floor)
  *  - encode:  the 32-plane PQ encode (map-only projection), count
  *  - cents:   the LSH codebook build — 64-dim explode through two
  *             hash aggregates down to 128 (m, cell) centroid rows,
  *             collected (this subtree sits INSIDE the broadcast of
  *             the shipped plan and re-runs per execution)
  *  - adc:     candidate scan + broadcast ADC join + (q, c) decimal
  *             aggregate + top-k, with the 128 centroid rows already
  *             LOCAL (what the fix would make the steady state)
  *  - full:    the shipped s09 end to end
  *
  * full - (encode + cents + adc) ~ overhead of re-deriving the
  * codebook inside the broadcast and the cache materialization.
  * Prints one JSON line plus the scheduled-job count of one full run.
  * Usage: graft.tools.S09Prof <sfDir>
  */
object S09Prof {
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
    import graft.functions.VectorFunctions.vec_dot

    val emb = Tables(spark, sfDir, "embeddings")
    emb.count() // warm footer caches
    val scan = med3 { emb.count(); () }

    val coded = emb.select(col("vec_id"), col("embedding"),
      graft.operators.PqIndex.codesCol.as("codes"))
    val encode = med3 { coded.count(); () }

    def centsDf = coded
      .select(posexplode(col("codes")).as(Seq("m", "cell")),
        col("embedding"))
      .select(col("m"), col("cell"),
        posexplode(expr("slice(embedding, m * 8 + 1, 8)"))
          .as(Seq("pos", "v")))
      .groupBy(col("m"), col("cell"), col("pos"))
      .agg((sum(col("v").cast(DecimalType(20, 10))).cast("double") /
        count(lit(1))).as("c"))
      .groupBy(col("m"), col("cell"))
      .agg(expr(
        "transform(sort_array(collect_list(struct(pos, c))), x -> x.c)")
        .as("cvec"))
      .withColumn("cn2", vec_dot(col("cvec"), col("cvec")))
    val cents = med3 { centsDf.collect(); () }

    // ADC tail with the codebook already LOCAL: qterms becomes a
    // 640-row LocalRelation, so the candidate scan's broadcast build
    // costs no distributed subtree
    val centsLocal = centsDf.collect().toSeq
    val centsRel = {
      import spark.implicits._
      centsLocal.map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2), r.getDouble(3)))
        .toDF("m", "cell", "cvec", "cn2")
    }
    def adcOnce(): Unit = {
      val qterms = coded.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .crossJoin(broadcast(centsRel))
        .select(col("q_id"), col("m"), col("cell"), col("cn2"),
          vec_dot(expr("slice(q_emb, m * 8 + 1, 8)"), col("cvec"))
            .as("term"))
      coded.select(col("vec_id").as("c_id"),
          posexplode(col("codes")).as(Seq("m", "cell")))
        .join(broadcast(qterms), Seq("m", "cell"))
        .filter(col("c_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("c_id"))
        .agg(sum(col("term").cast(DecimalType(25, 12))).as("s_dec"),
          sum(col("cn2").cast(DecimalType(25, 12))).as("n_dec"))
        .count()
      ()
    }
    adcOnce()
    val adc = med3 { adcOnce() }

    val full = med3 {
      graft.queries.Similarity.s09_pq_ann.run(spark, sfDir).collect(); ()
    }

    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    graft.queries.Similarity.s09_pq_ann.run(spark, sfDir).collect()
    spark.sparkContext.removeSparkListener(listener)

    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"s09prof","scan":${f(scan)},""" +
      s""""encode":${f(encode)},"cents":${f(cents)},"adc":${f(adc)},""" +
      s""""full":${f(full)},"jobs_full":$jobs}""")
    spark.stop()
  }
}
