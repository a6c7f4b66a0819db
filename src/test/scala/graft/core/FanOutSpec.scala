package graft.core

import graft.SparkSpec

/** Pins Tables.fanOut's gate BOTH ways (round-7 verdict Wrong #3).
  *
  * The corpus queries need full parallelism when the bench parquet is a
  * single split, but an unconditional `repartition(defaultParallelism)`
  * is a gratuitous full shuffle of the text column at 100 TB where the
  * scan already yields thousands of splits. fanOut must therefore:
  *   - repartition a single-split scan up to the session's cores, and
  *   - return a many-split scan UNTOUCHED (same plan object — no
  *     Exchange inserted before tokenization).
  */
class FanOutSpec extends SparkSpec {

  test("single-split scan fans out to the session's full parallelism") {
    val dir = tmpDir("fanout_single")
    spark.range(1000).selectExpr("id", "repeat('x', 10) AS text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val cores = spark.sparkContext.defaultParallelism
    assert(df.rdd.getNumPartitions < cores,
      "precondition: a single tiny parquet file must plan as < cores splits")
    val out = Tables.fanOut(df)
    assert(out.rdd.getNumPartitions == cores,
      "fanOut must widen an under-parallel scan to defaultParallelism")
    assert(out.queryExecution.executedPlan.toString.contains("Exchange"),
      "the widened plan should carry the explicit round-robin Exchange")
  }

  test("many-split scan is untouched — no Exchange added (100TB shape)") {
    // 64 files: Spark's file-bin-packing targets minPartitionNum
    // (= defaultParallelism) partitions, so the scan alone saturates the
    // session and fanOut must be the identity — the returned DataFrame
    // is the SAME object, proving no repartition node was added.
    val dir = tmpDir("fanout_many")
    spark.range(100000).selectExpr("id", "repeat('x', 64) AS text")
      .repartition(64).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val cores = spark.sparkContext.defaultParallelism
    assert(df.rdd.getNumPartitions >= cores,
      "precondition: 64 files must plan as >= cores splits")
    val out = Tables.fanOut(df)
    assert(out eq df,
      "fanOut must not touch a scan that already saturates the cores")
  }
}
