package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time curation gate — the streaming twin of the batch
  * quality-filter stage in [[graft.pipeline.Curate]]: crawl shards
  * stream in, every document is scored with EXACTLY the batch t02
  * expression ([[graft.queries.Text.withQuality]] — one shared copy, so
  * the streamed and batch admit decisions can never diverge),
  * sub-threshold documents are rejected at the door, and a running
  * per-source intake report is maintained as a streaming aggregate.
  * Run over the same corpus, the admitted set and the final mix report
  * are identical to the batch twin (`CurationStreamSpec`).
  *
  * Scale shape: the gate is a stateless map+filter (codegen'd
  * expressions, no UDFs) — it runs at scan speed on any number of
  * executors with zero state store; the mix report's streaming state is
  * ONE row per source. Contrast with [[DedupStream]], which needs
  * per-bucket state: quality gating is the cheap always-on first stage
  * of an intake pipeline, LSH dedup the stateful second.
  */
object CurationStream {
  /** Admit documents scoring at or above `threshold`. Works on a
    * streaming or batch `(doc_id, text, source, …)` relation; input
    * columns pass through, plus the `quality` score that justified
    * admission (for audit sinks). */
  def qualityGate(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    graft.queries.Text.withQuality(docs)
      .filter(col("quality") >= threshold)
      .select((docs.columns.map(col) :+ col("quality")): _*)

  /** Admit documents passing the published Gopher ruleset — the
    * rule-based sibling of [[qualityGate]]'s continuous score, sharing
    * [[graft.queries.Corpus.withGopherVerdict]] (one copy — streamed
    * and batch verdicts can never diverge; t29 oracle-gates the same
    * expression). Stateless map+filter; admitted rows carry the rule
    * columns (n_words, mean_word_len, stop_hits) for audit sinks. */
  def gopherGate(docs: DataFrame): DataFrame =
    graft.queries.Corpus.withGopherVerdict(docs)
      .filter(col("passes"))
      .select((docs.columns.map(col) ++
        Seq(col("n_words"), col("mean_word_len"), col("stop_hits"))): _*)

  /** Running per-source intake statistics over admitted documents:
    * docs admitted, characters admitted (exact longs — engine- and
    * order-independent). Complete-mode streaming aggregate; state is
    * one row per source. */
  def intakeMix(admitted: DataFrame): DataFrame =
    admitted.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_admitted"),
        sum(length(col("text")).cast("long")).as("admitted_chars"))
}
