package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of the persisted LSH dedup index — the intake
  * face of [[graft.operators.DedupIndex.append]]: new documents arrive
  * as files, each micro-batch appends its banded rows into the
  * partitioned index layout, and probes between batches see everything
  * ingested so far. `Trigger.AvailableNow` gives the cron-batch
  * semantics (drain what exists, stop) while the identical query runs
  * continuously on a cluster.
  *
  * Delivery contract: foreachBatch is AT-LEAST-ONCE on crash-retry (the
  * checkpoint makes a completed batch never re-run, but a batch that
  * crashed mid-append can re-append). That is safe HERE by construction:
  * the index is a bag of (doc_id, band, bh, sig) rows and
  * [[graft.operators.DedupIndex.probe]] ends in `.distinct()`, so
  * duplicated rows collapse to the same candidate set. The ANN index's
  * append is NOT exposed this way — its centroid-state merge is not
  * idempotent (a replayed batch would double-count the delta's sums);
  * streaming ANN maintenance needs a transactional sink or batch-id
  * dedup first.
  */
object IndexMaintenance {

  /** Start draining `docs` (a streaming (doc_id, text) relation) into
    * the dedup index at `root`. Works against an empty root too — the
    * first append creates the layout (stream-only bootstrap). */
  def maintainDedupIndex(docs: DataFrame, root: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/_maintenance_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        graft.operators.DedupIndex.append(batch.sparkSession, root, batch)
      }
      .start()
}
