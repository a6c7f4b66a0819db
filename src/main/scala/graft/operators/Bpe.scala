package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — "train the tokenizer on the
  * cluster", the missing piece between t07's BPE-ish token COUNTING
  * and an actual learned vocabulary.
  *
  * The classic algorithm (Sennrich et al. 2016): start from characters,
  * repeatedly merge the most frequent adjacent symbol pair. The
  * distributed shape that makes it tractable at 100 TB:
  *
  *  - the corpus collapses ONCE to the (word, count) vocabulary — the
  *    only corpus-sized pass; BPE statistics are identical on the
  *    weighted vocabulary, and |vocab| is sub-linear in corpus size;
  *  - every round then runs on vocabulary-sized data: explode adjacent
  *    pairs weighted by word count, one grouped sum, and a global
  *    argmax via TakeOrderedAndProject — the ONLY driver-side value per
  *    round is the winning pair (count desc, pair asc tie-break, so
  *    training is deterministic under any partitioning);
  *  - the merge applies as a declarative higher-order `aggregate` fold
  *    over each word's symbol array (struct-state: output + skip flag)
  *    — no UDF, no mapPartitions; the same fold ([[applyMerges]])
  *    re-tokenizes unseen text with the learned merges, so train-time
  *    and encode-time segmentation share one rule.
  *
  * The per-round driver collect is ONE row; rounds are `nMerges`
  * (typically 16k-64k in production — at that count the vocabulary
  * table is cached and each round is a sub-second vocab-sized job).
  */
object Bpe {

  /** Initial segmentation: a word becomes its character symbols. */
  private def chars(word: Column): Column =
    split(word, "")

  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** One declarative merge: rewrite every non-overlapping adjacent
    * (a, b) occurrence in `syms` to the fused symbol, left-to-right
    * (the reference semantics). Struct-state fold: (out, skip). */
  private def mergeExpr(syms: String, a: String, b: String): String = {
    val ab = sqlLit(a + b)
    s"""aggregate(
          sequence(0, size($syms) - 1),
          named_struct('out', CAST(array() AS ARRAY<STRING>),
                       'skip', false),
          (acc, i) -> CASE
            WHEN acc.skip THEN named_struct('out', acc.out, 'skip', false)
            WHEN i < size($syms) - 1
                 AND element_at($syms, i + 1) = ${sqlLit(a)}
                 AND element_at($syms, i + 2) = ${sqlLit(b)}
              THEN named_struct('out', concat(acc.out, array($ab)),
                                'skip', true)
            ELSE named_struct('out',
                   concat(acc.out, array(element_at($syms, i + 1))),
                   'skip', false)
          END,
          acc -> acc.out)"""
  }

  /** The corpus collapsed to its weighted character-split vocabulary —
    * the trainer's round-0 state: (syms, c) rows. */
  def initialVocab(docs: DataFrame): DataFrame =
    docs
      .transform(graft.core.Tables.fanOut)
      .select(explode(expr(graft.queries.Text.toksExpr)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .select(chars(col("w")).as("syms"), col("c"))

  /** Weighted adjacent-pair counts of a (syms, c) vocabulary, with the
    * trainer's candidate filter (a pair must REPEAT to be mergeable).
    * ONE copy of round statistics: every training round ranks this
    * relation, and t33_bpe_pairs gates the round-1 instance against
    * the DuckDB oracle — the trainer's first merge IS t33's first
    * row by construction. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(posexplode(col("syms")).as(Seq("i", "a")), col("syms"),
        col("c"))
      .where(col("i") < size(col("syms")) - 1)
      .select(col("a"),
        element_at(col("syms"), col("i") + 2).as("b"), col("c"))
      .groupBy(col("a"), col("b")).agg(sum(col("c")).as("n"))
      .where(col("n") > 1)

  /** Learn `nMerges` merges from a corpus of `text`. Returns the merge
    * list in training order. Stops early when no pair repeats. */
  def learnMerges(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    var vocab = initialVocab(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) continue = false
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = vocab
          .select(expr(mergeExpr("syms", a, b)).as("syms"), col("c"))
          .localCheckpoint(true)
        vocab.unpersist(false)
        vocab = next
      }
    }
    vocab.unpersist(false)
    merges.toSeq
  }

  /** Segment `wordCol` into `outCol` with a learned merge list — the
    * encode path, the SAME fold the trainer applied, in the same
    * order. Applied as one projection per merge (NOT one nested
    * expression: each fold references its input six times, so textual
    * inlining would grow 6^|merges|; chained column rewrites keep the
    * plan linear — Catalyst does not collapse a multiply-referenced
    * non-cheap alias). */
  def applyMerges(
      df: DataFrame, wordCol: String, outCol: String,
      merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(df.withColumn(outCol, chars(col(wordCol)))) {
      case (d, (a, b)) => d.withColumn(outCol, expr(mergeExpr(outCol, a, b)))
    }
}
