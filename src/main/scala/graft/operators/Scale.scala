package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out primitives: the patterns that keep 100 TB joins/aggregations
  * off the shuffle floor. Bench/testdata are small, so these are exercised
  * by plan-shape and equivalence tests rather than volume.
  */
object Scale {

  /** Write a DataFrame as a bucketed+sorted table. Two tables bucketed on
    * the same key with the same bucket count join with ZERO exchanges —
    * at 100 TB that converts the dominant shuffle into local merges. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. */
  def coLocatedJoin(
      spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Salted join for a skewed key: replicate the (small) build side
    * `salts` times and spread the probe side's hot keys across salt
    * buckets. Result is IDENTICAL to the plain join; only the partition
    * histogram changes. The probe salt derives from a hash of the whole
    * row (deterministic, uniform), so no single (key, salt) partition
    * carries a hot key alone.
    *
    * AQE's skew-join split handles moderate skew automatically; explicit
    * salting is for the pathological single-key case where one key
    * exceeds an executor. */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    val saltedProbe = probe.withColumn(
      "_salt", pmod(hash(probe.columns.map(col).toSeq: _*), lit(salts)))
    val saltsDf = probe.sparkSession.range(salts).toDF("_salt")
      .select(col("_salt").cast("int"))
    val replicatedBuild = build.crossJoin(broadcast(saltsDf))
    saltedProbe
      .join(replicatedBuild, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then merge per key. Works for any algebraic
    * aggregate given its (partial, merge) pair. */
  def saltedSum(
      df: DataFrame, key: Column, value: Column, salts: Int): DataFrame = {
    df.groupBy(key.as("k"),
        pmod(hash(value), lit(salts)).as("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col("k"))
      .agg(sum(col("_partial")).as("sum_value"))
  }
}
