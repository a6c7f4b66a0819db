package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Pii

/** Ingestion-time PII scrub — the streaming twin of the batch
  * `pii_scrub` stage in [[graft.pipeline.Curate]], sharing the SAME
  * [[Pii]] expressions so streamed and batch redactions can never
  * diverge. Crawl shards stream in; every document is counted per PII
  * class and redacted in one stateless pass, and a running per-source
  * scrub report is maintained as a streaming aggregate.
  *
  * Scale shape: like [[CurationStream]]'s quality gate, the scrub is a
  * stateless map (codegen'd regex built-ins, no UDFs) — scan speed on
  * any number of executors, zero state store; the report's streaming
  * state is ONE row per source. Scrubbing at the door rather than in the
  * nightly funnel means raw PII never lands in the lake's curated zone —
  * the compliance posture most pipelines actually need — while the batch
  * stage stays as the audit/backfill path.
  */
object PiiStream {
  /** Count per-class hits, THEN redact in place (counting after
    * redaction would always see zero). Works on a streaming or batch
    * `(…, text, …)` relation; all input columns pass through, `text` is
    * redacted, and the per-class hit counts ride along for audit sinks. */
  def scrub(docs: DataFrame): DataFrame =
    docs
      .withColumn("email_hits", Pii.emailHits(col("text")))
      .withColumn("ipv4_hits", Pii.ipv4Hits(col("text")))
      .withColumn("phone_hits", Pii.phoneHits(col("text")))
      .withColumn("text", Pii.redact(col("text")))

  /** Running per-source scrub report: docs seen, docs that carried PII,
    * hits by class. Complete-mode streaming aggregate; state is one row
    * per source. */
  def scrubReport(scrubbed: DataFrame): DataFrame =
    scrubbed.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("email_hits") + col("ipv4_hits") +
          col("phone_hits") > 0, 1L).otherwise(0L)).as("pii_docs"),
        sum(col("email_hits")).as("email_hits"),
        sum(col("ipv4_hits")).as("ipv4_hits"),
        sum(col("phone_hits")).as("phone_hits"))
}
