package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming quality gate ≡ batch t02 filter on the same corpus: the
  * admitted set must not depend on how the stream was sharded, and the
  * running mix report must converge to the batch aggregate — the
  * property that lets quality gating run at ingestion time instead of
  * as a nightly batch. */
// excluded from the default `sbt test` (CI budget) — run with
// GRAFT_TEST_ALL=1 or `testOnly`; see build.sbt
@org.scalatest.tags.Slow
class CurationStreamSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private val threshold = 0.5

  test("sharded streaming admits exactly the batch above-threshold set") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)].collect().toSeq
    // three uneven shards, arrival order unlike doc_id order
    val shards = docs.groupBy(d => (d._1 % 3).toInt).toSeq
      .sortBy(-_._1).map(_._2)

    val input = MemoryStream[(Long, String, String)](spark, 1)
    val gated = CurationStream.qualityGate(
      input.toDF().toDF("doc_id", "text", "source"), threshold)
    val q1 = gated.writeStream
      .format("memory").queryName("curation_gate_out")
      .outputMode(OutputMode.Append).start()
    val q2 = CurationStream.intakeMix(gated).writeStream
      .format("memory").queryName("curation_mix_out")
      .outputMode(OutputMode.Complete).start()
    try {
      shards.foreach { sh =>
        input.addData(sh)
        q1.processAllAvailable(); q2.processAllAvailable()
      }
      val admitted = spark.table("curation_gate_out")
        .select("doc_id").as[Long].collect().toSet

      // batch twin: the t02 operator itself, filtered at the threshold
      val batch = graft.queries.Text.t02_quality_score.run(spark, sfDir)
        .filter(col("quality") >= threshold)
        .select("doc_id").as[Long].collect().toSet
      assert(admitted == batch,
        s"streaming admitted ${admitted.size}, batch ${batch.size}")
      assert(admitted.nonEmpty && admitted.size < docs.size,
        "threshold did not discriminate; weak test")

      // the running mix report converged to the batch aggregate
      val mix = spark.table("curation_mix_out")
        .select("source", "n_admitted", "admitted_chars")
        .as[(String, Long, Long)].collect().toSet
      val batchMix = CurationStream.intakeMix(
        Tables(spark, sfDir, "documents")
          .select(col("doc_id"), col("text"), col("source"))
          .join(batch.toSeq.toDF("doc_id"), "doc_id"))
        .as[(String, Long, Long)].collect().toSet
      assert(mix == batchMix)

      // audit column: every admitted row carries its qualifying score
      val minQ = spark.table("curation_gate_out")
        .agg(min(col("quality"))).head().getDouble(0)
      assert(minQ >= threshold)
    } finally { q1.stop(); q2.stop() }
  }

  test("sharded streaming gopher gate admits exactly the batch rule-passing set") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)].collect().toSeq
    val shards = docs.groupBy(d => (d._1 % 4).toInt).toSeq
      .sortBy(-_._1).map(_._2)

    val input = MemoryStream[(Long, String, String)](spark, 1)
    val gated = CurationStream.gopherGate(
      input.toDF().toDF("doc_id", "text", "source"))
    val q = gated.writeStream
      .format("memory").queryName("gopher_gate_out")
      .outputMode(OutputMode.Append).start()
    try {
      shards.foreach { sh => input.addData(sh); q.processAllAvailable() }
      val admitted = spark.table("gopher_gate_out")
        .select("doc_id").as[Long].collect().toSet
      val batch = graft.queries.Corpus.t29_gopher_filter.run(spark, sfDir)
        .filter(col("passes")).select("doc_id").as[Long].collect().toSet
      assert(admitted == batch,
        s"gopher gate: streamed ${admitted.size}, batch ${batch.size}")
      assert(admitted.nonEmpty && admitted.size < docs.size,
        "gopher rules did not discriminate; weak test")
      // audit columns survive the gate
      assert(spark.table("gopher_gate_out")
        .filter(col("stop_hits") < 2).count() == 0)
    } finally q.stop()
  }
}
