package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time gate for the MULTIMODAL lane — the streaming twin of
  * the batch mm05 byte-distribution statistics, mirroring what
  * [[CurationStream]] does for text: binary payloads stream in from a
  * crawler, every payload is scored with EXACTLY the batch expression
  * ([[graft.queries.Multimodal.withByteStats]] — one shared copy, so the
  * streamed and batch reject decisions can never diverge), and
  * degenerate payloads are rejected BEFORE any codec runs:
  *
  *  - `entropy_bits` below the floor → constant-byte padding, truncated
  *    transfers, zeroed buffers (a real corpus's media bytes are
  *    high-entropy; a run of NULs is not an image);
  *  - `top_bucket_share` above the cap → single-value-dominated streams
  *    (the same degeneracy seen through a scale-free lens, which also
  *    catches short payloads the entropy floor can miss).
  *
  * Scale shape: a stateless map+filter — the histogram is a partition-
  * wise `mapPartitions` (the same batched seam a real codec would use),
  * the entropy ladder is exact-integer Catalyst expressions, and there
  * is NO state store: the gate runs at scan speed on any number of
  * executors. The running per-source intake report (when the relation
  * carries a `source` column) is a streaming aggregate with one state
  * row per source, exactly like [[CurationStream.intakeMix]].
  *
  * `MultimodalStreamSpec` proves the admitted set is shard- and
  * arrival-order-independent and identical to the batch filter.
  */
object MultimodalStream {
  /** Admit payloads whose byte distribution is non-degenerate. Works on
    * a streaming or batch relation with a binary `payloadCol`; input
    * columns pass through, plus the two scores that justified admission
    * (for audit sinks). */
  def entropyGate(
      assets: DataFrame,
      payloadCol: String = "payload",
      minEntropyBits: Double = 1.0,
      maxTopShare: Double = 0.5): DataFrame =
    graft.queries.Multimodal.withByteStats(assets, payloadCol)
      .filter(col("entropy_bits") >= minEntropyBits &&
        col("top_bucket_share") <= maxTopShare)
      .select((assets.columns.map(col) :+
        col("entropy_bits") :+ col("top_bucket_share")): _*)

  /** Running per-source intake statistics over admitted payloads: count
    * and bytes admitted (exact longs — engine- and order-independent).
    * Complete-mode streaming aggregate; state is one row per source. */
  def intakeMix(admitted: DataFrame, payloadCol: String = "payload"): DataFrame =
    admitted.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_admitted"),
        sum(octet_length(col(payloadCol)).cast("long")).as("admitted_bytes"))
}
