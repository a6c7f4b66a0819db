package graft.lake

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout must make files coverable by small boxes of the value
  * space, so single-dimension filters prune files the linear layout
  * cannot. "Must open" is modeled exactly as a stats-pruning reader
  * does: a file can be skipped iff its [min, max] of the filtered
  * column misses the predicate interval — measured here from the real
  * written files via input_file_name(). */
class ZOrderSpec extends SparkSpec {
  // sf0.01: ~10k events over ~150 users — enough rows per file (~300)
  // that a 5%-of-rows band is present in EVERY user-sorted file, making
  // the linear layout's inability to prune it unambiguous
  private val sfDir = "/root/testdata/sf0.01"
  private val Files = 32

  // events: user_id and value are independent dimensions — the classic
  // "queried along more than one axis" fact table
  private lazy val events =
    Tables(spark, sfDir, "events").select(col("user_id"), col("value"))

  private lazy val (linearRoot, zRoot) = {
    val lin = tmpDir("layout-linear")
    val zo = tmpDir("layout-zorder")
    // linear: the single-dimension best case — range by user_id
    events.repartitionByRange(Files, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("value"))
      .write.mode("overwrite").parquet(lin)
    Lake.writeZOrdered(events, zo, Seq("user_id", "value"), Files)
    (lin, zo)
  }

  /** Files whose [min, max] of `c` intersects [lo, hi] — the files a
    * stats-pruning scan must open. */
  private def mustOpen(root: String, c: String, lo: Double, hi: Double): Long =
    spark.read.parquet(root)
      .groupBy(input_file_name())
      .agg(min(col(c).cast("double")).as("mn"),
        max(col(c).cast("double")).as("mx"))
      .filter(col("mx") >= lo && col("mn") <= hi)
      .count()

  test("z-order prunes a second-dimension filter the linear sort cannot") {
    // a 5%-of-ROWS band on value (p40..p45 of the skewed empirical
    // distribution) — selective on the NON-sort dimension, but dense
    // enough that every user-sorted file contains matching rows
    val qs = events
      .select(expr("percentile_approx(value, array(0.40D, 0.45D), 10000)"))
      .collect()(0).getSeq[Double](0)
    val (bLo, bHi) = (qs(0), qs(1))
    val linOpen = mustOpen(linearRoot, "value", bLo, bHi)
    val zOpen = mustOpen(zRoot, "value", bLo, bHi)
    assert(linOpen >= Files * 0.9,
      s"linear layout unexpectedly clustered value: opens $linOpen/$Files")
    assert(zOpen <= Files / 2,
      s"z-order failed to localize value: opens $zOpen/$Files")
    assert(zOpen < linOpen)
  }

  test("z-order still prunes the first dimension to a bounded fraction") {
    val Array(lo, hi) = events
      .agg(min(col("user_id")).cast("double"),
        max(col("user_id")).cast("double")).collect()(0) match {
      case r => Array(r.getDouble(0), r.getDouble(1))
    }
    val span = hi - lo
    val (bLo, bHi) = (lo + 0.40 * span, lo + 0.45 * span)
    val zOpen = mustOpen(zRoot, "user_id", bLo, bHi)
    // the multi-dimension tradeoff: not as tight as a dedicated sort,
    // but a small fraction — NOT a full scan
    assert(zOpen <= Files / 2,
      s"z-order lost user_id locality entirely: opens $zOpen/$Files")
  }

  test("z-value interleaves bits exactly (Morton order)") {
    import spark.implicits._
    val df: DataFrame = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (2L, 0L), (0L, 2L), (3L, 3L)).toDF("x", "y")
    val got = df.select(Lake.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].collect().toSeq
    // bit i of x -> position 2i; bit i of y -> position 2i+1
    assert(got == Seq(0L, 1L, 2L, 3L, 4L, 8L, 15L))
  }

  test("an entirely-NULL z column is rejected loudly") {
    // percentile_approx of an all-NULL column returns NULL boundaries;
    // the old code NPE'd deep in getSeq (round-8 advice). Partial NULLs
    // are documented: they quantize to code 0 (the lowest box).
    val df = events.withColumn("dead", lit(null).cast("double"))
    val e = intercept[IllegalArgumentException] {
      Lake.writeZOrdered(df, tmpDir("layout-null"),
        Seq("user_id", "dead"), 4)
    }
    assert(e.getMessage.contains("entirely NULL"), e.getMessage)
  }

  test("the layout preserves every row (same multiset of rows)") {
    def sig(df: DataFrame) = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"),
        sum(col("value").cast("decimal(18,6)")).cast("decimal(30,6)").as("s"))
    val a = sig(spark.read.parquet(zRoot))
    val b = sig(events)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
