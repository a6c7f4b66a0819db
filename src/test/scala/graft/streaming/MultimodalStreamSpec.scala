package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming byte-distribution gate ≡ the batch mm05-statistics filter
  * on the same payloads: the admitted set must not depend on stream
  * sharding or arrival order — the property that lets degenerate-payload
  * rejection run at ingestion time, before any codec. */
class MultimodalStreamSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  // thresholds chosen so BOTH rules fire on this corpus (see the
  // discrimination asserts below) — the test is vacuous otherwise.
  // ASCII text payloads sit near 1.4 bits / 0.52 top-share on the
  // 16-bucket histogram (letters concentrate in 2-3 buckets), so the
  // spec pins at the ~3% and ~95% points of that distribution; real
  // media bytes would use the gate's looser defaults.
  private val minBits = 1.35
  private val maxShare = 0.56

  test("sharded streaming admits exactly the batch non-degenerate set") {
    import spark.implicits._
    val assets = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"))
    val rows = assets.as[(Long, Array[Byte], String)].collect().toSeq
    // three uneven shards, arrival order unlike doc_id order
    val shards = rows.groupBy(d => (d._1 % 3).toInt).toSeq
      .sortBy(-_._1).map(_._2)

    val input = MemoryStream[(Long, Array[Byte], String)](spark, 1)
    val gated = MultimodalStream.entropyGate(
      input.toDF().toDF("doc_id", "payload", "source"),
      minEntropyBits = minBits, maxTopShare = maxShare)
    val q1 = gated.writeStream
      .format("memory").queryName("mm_gate_out")
      .outputMode(OutputMode.Append).start()
    val q2 = MultimodalStream.intakeMix(gated).writeStream
      .format("memory").queryName("mm_mix_out")
      .outputMode(OutputMode.Complete).start()
    try {
      shards.foreach { sh =>
        input.addData(sh)
        q1.processAllAvailable(); q2.processAllAvailable()
      }
      val admitted = spark.table("mm_gate_out")
        .select("doc_id").as[Long].collect().toSet

      // batch twin: the shared scoring expression, filtered identically
      val scored = graft.queries.Multimodal.withByteStats(assets, "payload")
      val batch = scored
        .filter(col("entropy_bits") >= minBits &&
          col("top_bucket_share") <= maxShare)
        .select("doc_id").as[Long].collect().toSet
      assert(admitted == batch,
        s"streaming admitted ${admitted.size}, batch ${batch.size}")
      assert(admitted.nonEmpty && admitted.size < rows.size,
        "thresholds did not discriminate; weak test")
      // each rule individually rejects someone at these thresholds
      assert(scored.filter(col("entropy_bits") < minBits).count() > 0)
      assert(scored.filter(col("top_bucket_share") > maxShare).count() > 0)

      // the running mix report converged to the batch aggregate
      val mix = spark.table("mm_mix_out")
        .select("source", "n_admitted", "admitted_bytes")
        .as[(String, Long, Long)].collect().toSet
      val batchMix = MultimodalStream.intakeMix(
        assets.join(batch.toSeq.toDF("doc_id"), "doc_id"))
        .as[(String, Long, Long)].collect().toSet
      assert(mix == batchMix)
    } finally { q1.stop(); q2.stop() }
  }
}
