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
  * crashed mid-append can re-append). Each index meets that contract
  * its own way:
  *  - dedup: safe by construction — the index is a bag of
  *    (doc_id, band, bh, sig) rows and
  *    [[graft.operators.DedupIndex.probe]] ends in `.distinct()`, so
  *    duplicated rows collapse to the same candidate set;
  *  - ANN: the batch-path [[graft.operators.AnnIndex.append]] is NOT
  *    replay-safe (its centroid-state read-merge-overwrite would
  *    double-count a replayed batch), so the streaming path uses
  *    [[graft.operators.AnnIndex.appendIdempotent]] instead: every
  *    layer a batch writes is an overwrite of a batch-id-derived path,
  *    and centroids re-derive from the sum over all per-batch state
  *    deltas — replaying a batch rewrites the same bytes rather than
  *    applying a delta twice;
  *  - inverted (BM25): same recipe as ANN — the batch-path
  *    [[graft.operators.InvertedIndex.append]] bag-appends postings
  *    AND read-add-overwrites the corpus stats row, both unsafe under
  *    replay, so the streaming path uses
  *    [[graft.operators.InvertedIndex.appendIdempotent]]: postings and
  *    the per-batch stats addend land at batch-id-derived paths, and
  *    corpus totals are a sum over batch rows.
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

  /** Start draining `vecs` (a streaming (vec_id, embedding, label)
    * relation) into the ANN index at `root` — stream-owned bootstrap:
    * the root starts empty and every layer is built by the idempotent
    * per-batch appends, so probes between drains are bit-identical to a
    * batch build over everything ingested so far (pinned in
    * `AnnStreamSpec`). Do not point this at a root created by
    * `buildIfMissing` — the two layouts deliberately differ (see
    * [[graft.operators.AnnIndex.appendIdempotent]]).
    *
    * `compactEveryBatches` folds the per-batch layout into
    * size-tiered generations every k-th drained batch, INSIDE the stream
    * (see [[maintainInvertedIndex]] for why in-batch compaction is
    * safe); None = manual compaction cadence. */
  def maintainAnnIndex(
      vecs: DataFrame, root: String,
      compactEveryBatches: Option[Int] = None): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/_maintenance_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        graft.operators.AnnIndex.appendIdempotent(
          batch.sparkSession, root, batch, id)
        if (compactEveryBatches.exists(k => k > 0 && (id + 1) % k == 0))
          graft.operators.AnnIndex.compactBatches(batch.sparkSession, root)
        ()
      }
      .start()

  /** Start draining `docs` (a streaming (doc_id, text) relation) into a
    * stream-owned BM25 postings index at `root` — bootstrap and
    * maintenance in one query; probes between drains match the inline
    * t31 ranking over everything ingested so far (pinned in
    * `InvertedStreamSpec`). Do not point this at a
    * [[graft.operators.InvertedIndex.buildIfMissing]] root — the
    * batch and stream layouts deliberately differ (see
    * [[graft.operators.InvertedIndex.appendIdempotent]]).
    *
    * `compactEveryBatches = Some(k)` makes compaction part of the
    * MAINTENANCE STREAM itself: after every k-th drained batch the
    * per-batch layout folds into a fresh size-tiered generation
    * ([[graft.operators.Generations]]). Running the fold
    * INSIDE foreachBatch is safe because a micro-batch query executes
    * batches strictly sequentially (no concurrent drain can race the
    * fold), and the crash matrix reduces to the operator's own
    * protocol: a crash before the fold's publish rename leaves staging
    * garbage and the batch replays normally; a crash AFTER the publish
    * but before the checkpoint commit replays a batch the fold already
    * holds, which `appendIdempotent`'s at-or-below-cutoff guard skips
    * (pinned in `IndexMaintenanceSpec`). None = compact manually
    * between drains (the `Pipeline.llmLane` cadence). */
  def maintainInvertedIndex(
      docs: DataFrame, root: String,
      compactEveryBatches: Option[Int] = None): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/_maintenance_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        graft.operators.InvertedIndex.appendIdempotent(
          batch.sparkSession, root, batch, id)
        if (compactEveryBatches.exists(k => k > 0 && (id + 1) % k == 0))
          graft.operators.InvertedIndex.compactBatches(
            batch.sparkSession, root)
        ()
      }
      .start()

  /** Maintain a stream-owned BM25 postings index by FOLLOWING a
    * governed [[graft.lake.SnapshotTable]] through the `graft-changes`
    * streaming source (round-13 verdict item 6) — the production shape
    * of the maintenance story: the index consumer needs no access to
    * the upstream ingest feed, only the committed table, and the
    * checkpoint's resume point IS the table's own version number
    * ([[ChangeFeedSource]]'s offsets-are-versions contract). Each
    * drained micro-batch is one-or-more committed versions' insert
    * rows, appended through the same replay-safe per-batch layout as
    * [[maintainInvertedIndex]].
    *
    * APPEND-ONLY consumer by contract: postings are an additive bag,
    * so a delete or update pre-image in the feed FAILS the batch
    * loudly rather than silently leaving stale postings behind — a
    * corpus that re-curates documents maintains retrieval through
    * [[graft.operators.TokenizedCorpus]]'s refresh path (which
    * re-derives touched partitions) or rebuilds, not through this
    * maintainer. */
  def followTableIntoInvertedIndex(
      spark: org.apache.spark.sql.SparkSession, tableRoot: String,
      indexRoot: String,
      compactEveryBatches: Option[Int] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.col
    import graft.lake.ChangeFeed
    spark.readStream.format("graft-changes")
      .option("root", tableRoot).load()
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$indexRoot/_maintenance_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        val nonInsert = batch
          .filter(col(ChangeFeed.ChangeTypeCol) =!= ChangeFeed.Insert)
          .limit(1).count()
        require(nonInsert == 0,
          s"change feed of $tableRoot carries deletes/updates — " +
            "postings are an additive bag; re-curated corpora maintain " +
            "retrieval via TokenizedCorpus.refresh or a rebuild, not " +
            "this append-only maintainer")
        graft.operators.InvertedIndex.appendIdempotent(
          batch.sparkSession, indexRoot,
          batch.select(col("doc_id"), col("text")), id)
        if (compactEveryBatches.exists(k => k > 0 && (id + 1) % k == 0))
          graft.operators.InvertedIndex.compactBatches(
            batch.sparkSession, indexRoot)
        ()
      }
      .start()
  }
}
