package graft.lake

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class LakeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("partitioned write prunes partitions on the key predicate") {
    val root = tmpDir("lake") + "/orders"
    Lake.writePartitioned(
      Tables(spark, sfDir, "orders")
        .withColumn("order_year", year(col("o_orderdate"))),
      root, partitionBy = Seq("order_year"), clusterBy = Seq("o_custkey"))
    val pruned = spark.read.parquet(root).filter(col("order_year") === 1999)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("order_year"), s"expected partition pruning:\n$scan")
    // pruning is also observable: matching rows only
    val expected = Tables(spark, sfDir, "orders")
      .filter(year(col("o_orderdate")) === 1999).count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("compaction reduces file count, preserves data") {
    val root = tmpDir("lake") + "/li"
    // deliberately fragment: many tasks per partition dir
    Tables(spark, sfDir, "lineitem")
      .withColumn("flag", col("l_returnflag"))
      .repartition(16)
      .write.partitionBy("flag").parquet(root)
    val before = Lake.countDataFiles(spark, root)
    val rows = spark.read.parquet(root).count()
    val (b, a) = Lake.compact(spark, root, Seq("flag"), targetFiles = 1)
    assert(b == before && a < b,
      s"expected fewer files after compaction: $b -> $a")
    assert(spark.read.parquet(root).count() == rows)
    // per-partition file count == targetFiles
    assert(a == 3) // one per return flag
  }
}
