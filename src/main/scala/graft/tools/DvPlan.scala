package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: print the formatted physical plan of a partition-
  * filtered scan over a deletion-vector-carrying lake table — the
  * plan-shape evidence for DvApply's pruning-preserving split (round
  * 19): before, ANY live `#dv` line replaced the whole relation with
  * an unpruned ManifestScan splice; after, dv-free directories keep
  * the DSv2 pruned path and only the dv-carrying directories ride the
  * anti-joined read. Not part of the driver contract.
  *
  * Usage: graft.tools.DvPlan
  */
object DvPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files
      .createTempDirectory("graft_dvplan_").toString + "/t"
    val df = spark.range(4000L).select(
      (col("id") % 4).cast("string").as("src"),
      col("id").as("k"), (col("id") * 7 % 101).as("v"))
    graft.lake.SnapshotTable.write(spark, root, df, Seq("src"),
      lookupFor = Seq("k"))
    graft.lake.LakeCatalog.install(spark)
    graft.lake.LakeCatalog.register(spark, "dvplan", root)
    // one-row delete in partition src=0 — a single dv-carrying dir
    graft.lake.SnapshotTable.deleteRowsWhere(spark, root,
      col("k") === 400L)
    val q = spark.sql(
      "SELECT sum(v) FROM lake.dvplan WHERE src = '1'")
    println("== partition-filtered sum over a dv-carrying table ==")
    println(q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    q.collect().foreach(r => println(s"result: $r"))

    // timing leg at a size where the scan cost dominates the job
    // floor: 8M rows across 16 partitions, one row dv-deleted in one
    // partition, then a single-partition filtered sum — med of 5
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_dvplan_big_").toString + "/t"
    val big = spark.range(8000000L).select(
      (col("id") % 16).cast("string").as("src"),
      col("id").as("k"), (col("id") * 7 % 101).as("v"))
    graft.lake.SnapshotTable.write(spark, root2, big, Seq("src"),
      lookupFor = Seq("k"))
    graft.lake.LakeCatalog.register(spark, "dvplan_big", root2)
    def time5(sql: String): Double = (1 to 6).map { _ =>
      val t0 = System.nanoTime()
      spark.sql(sql).collect()
      (System.nanoTime() - t0) / 1e9
    }.drop(1).sorted.apply(2)
    // dv-FREE control: the normal DSv2 pruned path a clean table gets
    val ctlFiltered = time5(
      "SELECT sum(v) FROM lake.dvplan_big WHERE src = '1'")
    val ctlFull = time5(
      "SELECT sum(v) FROM lake.dvplan_big WHERE k >= 0")
    graft.lake.SnapshotTable.deleteRowsWhere(spark, root2,
      col("k") === 4000000L) // src = 4000000 % 16 = 0
    val filtered = time5(
      "SELECT sum(v) FROM lake.dvplan_big WHERE src = '1'")
    val full = time5(
      "SELECT sum(v) FROM lake.dvplan_big WHERE k >= 0")
    println(f"dv-free  filtered-slice med: $ctlFiltered%.3f s")
    println(f"dv-free  whole-table   med: $ctlFull%.3f s")
    println(f"dv_scan  filtered-slice med: $filtered%.3f s")
    println(f"dv_scan  whole-table   med: $full%.3f s")
    spark.stop()
  }
}
