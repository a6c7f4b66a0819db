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
  *
  * Loads are memoized per session: `spark.read.parquet` lists files and
  * reads footers for schema inference every call, a fixed ~50-100 ms tax
  * that a 70-query run pays 200+ times for the same immutable inputs. The
  * cached value is only the analyzed relation (plan metadata, no data);
  * lifetime/bounding is [[SessionCache]]'s. This is exactly what a
  * catalog gives a real deployment — schema and file listing resolved
  * once, not per query.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val cache = new SessionCache[(String, String)]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
      // rejects ([PARQUET_TYPE_ILLEGAL]). The legacy conf must hold at
      // execution time too, so (re)set it on every lookup, cached or not.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    cache.getOrElseUpdate(spark, (sfDir, name))(load(spark, sfDir, name))
  }

  private def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        // Read raw nanos and convert to a microsecond TimestampType with
        // integer division — `/ 1000` in double would lose precision at
        // 1e18 ns.
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
