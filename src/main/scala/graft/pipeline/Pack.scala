package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

/** Sequence-packing manifest: turns per-document token counts into the
  * exact (bin, segment) assembly instructions a training loader needs to
  * build fixed-size rows by GPT-style concat-and-chunk — documents laid
  * end-to-end per source in doc_id order, cut every `ctx` tokens.
  *
  * The manifest is all a loader needs: each row says "tokens
  * [tok_from, tok_to) of doc D land in bin B". Every bin except each
  * source's last receives exactly `ctx` tokens (pinned in `PackSpec`),
  * and each document's segments tile it completely, in order, exactly
  * once — the loader never re-tokenizes or re-shuffles text to assemble
  * a batch.
  *
  * Scale shape: the start offsets come from the distributed two-pass
  * [[PrefixSum]] (no per-source one-task window), the explode emits one
  * row per (doc, bin) intersection — at most `n_tok/ctx + 2` rows per
  * doc, so the manifest is ~1/ctx of the corpus token count — and the
  * shard write below partitions by bin range so a trainer reads one
  * directory per shard.
  *
  * Input contract: a frame with `source`, `doc_id` (unique order key)
  * and `n_tok` (the caller's token model — word runs for the t28 gate,
  * a real BPE count in production; the packing math is count-agnostic).
  */
object Pack {

  /** Per-doc placement: exclusive token prefix `cum` within the
    * source's concat stream, and the first/last bin the doc touches. */
  def assign(docsWithNTok: DataFrame, ctx: Long): DataFrame =
    PrefixSum.exclusive(
      docsWithNTok, Seq("source"), Seq("doc_id"), "n_tok", "cum")
      .withColumn("first_bin",
        floor(col("cum") / lit(ctx.toDouble)).cast("long"))
      .withColumn("last_bin",
        when(col("n_tok") > 0,
          floor((col("cum") + col("n_tok") - 1) / lit(ctx.toDouble))
            .cast("long"))
          .otherwise(floor(col("cum") / lit(ctx.toDouble)).cast("long")))

  /** One row per (doc, bin) slice: doc-relative token range
    * `[tok_from, tok_to)` that lands in `bin`. Empty docs vanish (they
    * occupy no tokens). */
  def segments(docsWithNTok: DataFrame, ctx: Long): DataFrame =
    assign(docsWithNTok, ctx)
      .where(col("n_tok") > 0)
      .select(col("source"), col("doc_id"), col("cum"), col("n_tok"),
        explode(expr("sequence(first_bin, last_bin)")).as("bin"))
      .withColumn("tok_from",
        greatest(col("bin") * ctx - col("cum"), lit(0L)))
      .withColumn("tok_to",
        least((col("bin") + 1) * ctx - col("cum"), col("n_tok")))
      .select(col("source"), col("bin"), col("doc_id"),
        col("tok_from"), col("tok_to"))

  /** Write the manifest parquet partitioned by (source, shard) with
    * `binsPerShard` bins per shard directory — the unit a trainer
    * reads. Deterministic: same corpus → byte-identical manifest. */
  def writeManifest(
      docsWithNTok: DataFrame,
      ctx: Long,
      binsPerShard: Long,
      outDir: String): Unit =
    segments(docsWithNTok, ctx)
      .withColumn("shard", expr(s"bin DIV $binsPerShard"))
      .sortWithinPartitions(col("source"), col("bin"), col("doc_id"))
      .write.mode("overwrite").partitionBy("source", "shard")
      .parquet(outDir)
}
