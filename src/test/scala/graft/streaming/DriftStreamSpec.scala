package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming drift monitor ≡ batch t22 on the same corpus: streamed
  * through uneven shards in non-doc order, the FINAL per-source KS rows
  * must be bit-identical to the batch statistic computed against the
  * same reference — the property that lets drift alarms run at
  * ingestion time instead of as a nightly batch. */
class DriftStreamSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("sharded streaming drift converges bit-identically to batch t22") {
    import spark.implicits._
    // reference = the corpus's own length profile, so the streaming
    // run must converge to exactly the batch t22 rows
    val ref = Tables(spark, sfDir, "documents")
      .groupBy(col("n_chars")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap

    val docs = Tables(spark, sfDir, "documents")
      .select(col("source"), col("n_chars"))
      .as[(String, Long)].collect().toSeq
    // three uneven shards, arrival order unlike source order
    val shards = docs.zipWithIndex.groupBy(_._2 % 3).toSeq
      .sortBy(-_._1).map(_._2.map(_._1))

    val input = MemoryStream[(String, Long)](spark, 1)
    val monitored = DriftStream.lengthDrift(
      input.toDF().toDF("source", "n_chars"), ref)
    val q = monitored.writeStream
      .format("memory").queryName("drift_out")
      .outputMode(OutputMode.Update).start()
    try {
      shards.foreach { sh => input.addData(sh); q.processAllAvailable() }
      // Update mode appends one row per (source, trigger); the row with
      // the highest n_docs per source is the converged final state
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_docs").desc)
      val streamed = spark.table("drift_out")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("source", "n_docs", "ks_num", "ks")
        .as[(String, Long, Long, Double)].collect().toSet

      val batch = graft.queries.Text.t22_length_drift.run(spark, sfDir)
        .as[(String, Long, Long, Double)].collect().toSet
      assert(streamed == batch,
        s"streamed=${streamed.toSeq.sortBy(_._1).take(3)}… " +
          s"batch=${batch.toSeq.sortBy(_._1).take(3)}…")
      assert(batch.exists(_._4 > 0), "all-zero KS; weak test")
    } finally { q.stop() }
  }

  test("mid-stream rows monitor the prefix seen so far") {
    import spark.implicits._
    val ref = Map(10L -> 1L, 20L -> 1L)
    // after shard 1 srcX has seen only {10}: cum=[1,1] vs ref [1,2]
    // cross-multiplied |1*2-1*1|=1, |2-2|=0 => ks_num=1, ks=1/(1*2)=0.5
    val input = MemoryStream[(String, Long)](spark, 1)
    val q = DriftStream.lengthDrift(
        input.toDF().toDF("source", "n_chars"), ref)
      .writeStream.format("memory").queryName("drift_mid")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(Seq(("srcX", 10L))); q.processAllAvailable()
      val mid = spark.table("drift_mid")
        .as[(String, Long, Long, Double)].collect().toSet
      assert(mid == Set(("srcX", 1L, 1L, 0.5)), s"got $mid")
      // second shard completes the reference shape: drift vanishes
      input.addData(Seq(("srcX", 20L))); q.processAllAvailable()
      val fin = spark.table("drift_mid")
        .as[(String, Long, Long, Double)].collect().toSet
      assert(fin.contains(("srcX", 2L, 0L, 0.0)), s"got $fin")
    } finally { q.stop() }
  }
}
