package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage/variant breakdown for s12_embed_covariance (round-16 verdict
  * item 2: "where the second goes — explode row volume? DECIMAL(18,6)
  * sums? codegen fallback? — is unproven"). Times each suspect in
  * isolation on the same corpus:
  *
  *  - scan:    embeddings scan + fanOut + count (the floor)
  *  - explode: the 2080-cell nested-transform explode, count only
  *             (row volume without aggregation)
  *  - agg_dec: explode + DECIMAL(18,6) hash aggregate (the shipped
  *             Gram stage)
  *  - agg_lng: explode + LONG unscaled-micros hash aggregate (same
  *             exactness per cell; isolates the decimal-sum cost)
  *  - kernel:  per-partition long[2080] Gram accumulation via
  *             mapPartitions (the BLAS-shaped candidate), merged
  *             exactly
  *  - full:    the shipped s12 query end to end
  *
  * Usage: graft.tools.S12Prof <sfDir>
  */
object S12Prof {
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
    import spark.implicits._

    val emb = Tables(spark, sfDir, "embeddings").transform(Tables.fanOut)
    emb.count() // warm footer caches

    val scan = med3 { emb.count(); () }

    val cellsExpr = expr(
      """explode(flatten(transform(sequence(0, 63), i ->
           transform(sequence(i, 63), j ->
             struct(i AS i, j AS j,
               CAST(CAST(embedding[i] AS DOUBLE) *
                    CAST(embedding[j] AS DOUBLE)
                 AS DECIMAL(18,6)) AS prod)))))""").as("c")

    val exploded = emb.select(cellsExpr)
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.prod"))
    val explodeOnly = med3 { exploded.count(); () }

    val aggDec = med3 {
      exploded.groupBy(col("i"), col("j"))
        .agg(sum(col("prod")).as("sm")).count(); ()
    }

    val aggLng = med3 {
      exploded
        .select(col("i"), col("j"),
          (col("prod") * lit(1000000)).cast("long").as("u"))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("u")).as("sm")).count(); ()
    }

    // BLAS-shaped kernel: per-partition long[2080] of exact unscaled
    // micro-units (each cell = round-half-up(prod, 6dp) * 1e6, the
    // same value the DECIMAL cast produces), merged by cell
    def kernelOnce(): Unit = {
      val cells = emb.select(col("embedding")).as[Array[Float]]
        .mapPartitions { it =>
          val acc = new Array[Long](2080)
          it.foreach { v =>
            var i = 0; var k = 0
            while (i < 64) {
              val vi = v(i).toDouble
              var j = i
              while (j < 64) {
                val p = vi * v(j).toDouble
                acc(k) = Math.addExact(acc(k),
                  java.math.BigDecimal.valueOf(p)
                    .setScale(6, java.math.RoundingMode.HALF_UP)
                    .unscaledValue().longValueExact())
                k += 1; j += 1
              }
              i += 1
            }
          }
          Iterator.single(acc)
        }
        .flatMap(acc => acc.iterator.zipWithIndex.map {
          case (s, k) => (k, s)
        })
        .toDF("k", "u")
        .groupBy(col("k")).agg(sum(col("u")).as("sm"))
      cells.count(); ()
    }
    kernelOnce()
    val kernel = med3 { kernelOnce() }

    val full = med3 {
      graft.queries.Similarity.s12_embed_covariance.run(spark, sfDir)
        .collect(); ()
    }

    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"s12prof","scan":${f(scan)},""" +
      s""""explode":${f(explodeOnly)},"agg_dec":${f(aggDec)},""" +
      s""""agg_lng":${f(aggLng)},"kernel":${f(kernel)},""" +
      s""""full":${f(full)}}""")
    spark.stop()
  }
}
