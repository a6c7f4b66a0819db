package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming PII scrub ≡ batch scrub on the same rows, regardless of
  * how the stream was sharded — the property that lets redaction run at
  * ingestion time so raw PII never lands in the curated zone. */
class PiiStreamSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("sharded streaming scrub matches the batch scrub exactly") {
    import spark.implicits._
    // real corpus docs (no PII) + injected PII-bearing docs, so both
    // the pass-through and the redaction paths are exercised
    val corpus = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)].collect().toSeq.take(60)
    val dirty = Seq(
      (900001L, "ping admin@example.com from 10.1.2.3 now", "srcA"),
      (900002L, "fallback 192.168.0.1 then call 555-123-4567", "srcA"),
      (900003L, "bob@x.org and carol@y.io emailed twice", "srcB"),
      (900004L, "clean doc with no identifiers at all", "srcB"))
    val docs = scala.util.Random.shuffle(corpus ++ dirty)
    val shards = docs.grouped(17).toSeq

    val input = MemoryStream[(Long, String, String)](spark, 1)
    val scrubbed = PiiStream.scrub(
      input.toDF().toDF("doc_id", "text", "source"))
    val q1 = scrubbed.writeStream
      .format("memory").queryName("pii_scrub_out")
      .outputMode(OutputMode.Append).start()
    val q2 = PiiStream.scrubReport(scrubbed).writeStream
      .format("memory").queryName("pii_report_out")
      .outputMode(OutputMode.Complete).start()
    try {
      shards.foreach { sh =>
        input.addData(sh)
        q1.processAllAvailable(); q2.processAllAvailable()
      }
      val streamed = spark.table("pii_scrub_out")
        .select("doc_id", "text", "email_hits", "ipv4_hits", "phone_hits")
        .as[(Long, String, Long, Long, Long)].collect().toSet
      val batch = PiiStream.scrub(docs.toDF("doc_id", "text", "source"))
        .select("doc_id", "text", "email_hits", "ipv4_hits", "phone_hits")
        .as[(Long, String, Long, Long, Long)].collect().toSet
      assert(streamed == batch, "stream and batch scrubs diverge")

      // redaction really happened and nothing detectable remains
      val byId = streamed.map(r => r._1 -> r).toMap
      assert(byId(900001L)._2 == "ping [EMAIL] from [IP] now")
      assert(byId(900002L)._2 == "fallback [IP] then call [PHONE]")
      assert(byId(900003L)._3 == 2L)
      assert(byId(900004L)._2 == "clean doc with no identifiers at all")
      val residual = spark.table("pii_scrub_out")
        .filter(graft.functions.Pii.hasPii(col("text"))).count()
      assert(residual == 0, "redacted text still contains detectable PII")

      // the running report converged to the batch aggregate
      val mix = spark.table("pii_report_out")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      val batchMix = PiiStream.scrubReport(
        PiiStream.scrub(docs.toDF("doc_id", "text", "source")))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(mix == batchMix)
      val srcA = mix.find(_._1 == "srcA").get
      assert(srcA._3 == 2L, s"srcA should have 2 PII docs: $srcA")
    } finally { q1.stop(); q2.stop() }
  }
}
