package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every table is a plain parquet scan: Catalyst's datasource V2 path gives
  * column pruning + filter pushdown for free, so downstream operators must
  * express projections/predicates declaratively (never `.rdd`/collect) for
  * those to reach the scan. At 100 TB these would be partitioned/bucketed
  * catalog tables; `spark.read.parquet(dir)` transparently handles a
  * directory of many files, so nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        // rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos (legacy
        // conf) and convert to a microsecond TimestampType with integer
        // division — `/ 1000` in double would lose precision at 1e18 ns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/$name.parquet")
          .withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
