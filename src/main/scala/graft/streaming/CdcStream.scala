package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC apply — the intake face of
  * [[graft.lake.Lake.upsert]]: change batches arrive as files, each
  * micro-batch upserts into the partitioned curated dataset, and only
  * the partitions a batch touches are rewritten. `Trigger.AvailableNow`
  * gives the cron-batch semantics (drain what exists, stop) while the
  * identical query runs continuously on a cluster.
  *
  * Replay contract (foreachBatch is AT-LEAST-ONCE): an upsert is
  * idempotent in its content — re-applying the same change batch
  * replaces the same keys with the same rows — so a crashed-then-
  * retried batch converges instead of double-applying (pinned in
  * `CdcStreamSpec`). A crash INSIDE the partition swap window leaves
  * the dataset recoverable via [[graft.lake.Lake.recoverUpsert]]; run
  * it before restarting the stream (the checkpoint will then replay
  * the interrupted batch to completion).
  *
  * The checkpoint lives under `<root>/_cdc_checkpoint` — the
  * underscore prefix keeps Spark's file index from reading it as data.
  */
object CdcStream {
  def maintainUpserts(
      updates: DataFrame,
      root: String,
      key: String,
      partitionBy: String): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/_cdc_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        graft.lake.Lake.upsert(batch.sparkSession, root, batch,
          key, partitionBy)
        ()
      }
      .start()
}
