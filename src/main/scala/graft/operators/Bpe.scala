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
  *  - the pair-count table is maintained INCREMENTALLY (the single-node
  *    trick that makes 16k-64k merges feasible, distributed): a merge
  *    of (a, b) only changes pairs inside words that CONTAIN adjacent
  *    (a, b), so each round recounts pairs for exactly those words and
  *    applies the exact delta (new minus old) to the pair table — never
  *    a full re-explode of the vocabulary. Per-round cost is
  *    (affected words) + (pair-table-sized shuffle), both of which
  *    SHRINK as training proceeds, instead of a constant full
  *    vocabulary explode per round;
  *  - the global argmax is a TakeOrderedAndProject over the maintained
  *    pair table — the ONLY driver-side value per round is the winning
  *    pair (count desc, pair asc tie-break, so training is
  *    deterministic under any partitioning);
  *  - the merge applies as a declarative higher-order `aggregate` fold
  *    over each word's symbol array (struct-state: output + skip flag)
  *    — no UDF, no mapPartitions; the same fold ([[applyMerges]])
  *    re-tokenizes unseen text with the learned merges, so train-time
  *    and encode-time segmentation share one rule.
  *
  * The per-round driver collect is ONE row. What remains inherently
  * sequential is BPE itself: merge k+1's statistics depend on merge k,
  * so `nMerges` rounds are `nMerges` (small) Spark jobs — the
  * scheduling floor of the algorithm's data dependency, not of this
  * implementation. Encode-side, [[applyMerges]] bounds the PLAN depth
  * by checkpointing every `checkpointEvery` merges, so a 16k-merge
  * tokenizer applies as ~250 bounded-size projections instead of one
  * 16k-projection plan (Catalyst's analyzer is superlinear in plan
  * depth).
  */
object Bpe {

  /** The frozen merge list the oracle-gated encode query
    * (t39_bpe_encode) ships — LEARNED by [[learnMerges]] over the
    * sf0.001 documents corpus (16 merges) and hard-coded here the way
    * a production tokenizer artifact is: trained once on a sample,
    * applied corpus-wide. A constant (not retrained per run) because
    * the cross-engine gate needs the IDENTICAL list on both sides —
    * the DuckDB oracle unrolls these merges as chained string
    * replaces. `BpeSpec` re-derives the list from the training corpus,
    * so drift between this constant and the trainer is a loud spec
    * failure, never a silent skew. */
  val ShippedMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"))

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

  /** TRUE iff `syms` contains an adjacent (a, b) occurrence — the
    * affected-word predicate of the incremental update. Guarded for
    * single-symbol words: `sequence(1, 0)` would be DESCENDING in
    * Spark and index 0 out of range. */
  private def containsPairExpr(syms: String, a: String, b: String): String =
    s"""(size($syms) > 1 AND exists(
          sequence(1, size($syms) - 1),
          i -> element_at($syms, i) = ${sqlLit(a)}
               AND element_at($syms, i + 1) = ${sqlLit(b)}))"""

  /** The corpus collapsed to its weighted character-split vocabulary —
    * the trainer's round-0 state: (syms, c) rows. */
  def initialVocab(docs: DataFrame): DataFrame =
    docs
      .transform(graft.core.Tables.fanOut)
      .select(explode(expr(graft.queries.Text.toksExpr)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .select(chars(col("w")).as("syms"), col("c"))

  /** Weighted adjacent-pair counts of a (syms, c) vocabulary — the
    * relation the incremental trainer maintains (no candidate filter:
    * a pair at n = 1 must stay in the table so later deltas can raise
    * it back above the merge threshold). */
  private[operators] def pairCountsAll(vocab: DataFrame): DataFrame =
    vocab
      .select(posexplode(col("syms")).as(Seq("i", "a")), col("syms"),
        col("c"))
      .where(col("i") < size(col("syms")) - 1)
      .select(col("a"),
        element_at(col("syms"), col("i") + 2).as("b"), col("c"))
      .groupBy(col("a"), col("b")).agg(sum(col("c")).as("n"))

  /** Pair counts with the trainer's candidate filter (a pair must
    * REPEAT to be mergeable). ONE copy of round statistics: every
    * training round ranks exactly this relation (the maintained table
    * filtered at selection time), and t33_bpe_pairs gates the round-1
    * instance against the DuckDB oracle — the trainer's first merge IS
    * t33's first row by construction. */
  def pairCounts(vocab: DataFrame): DataFrame =
    pairCountsAll(vocab).where(col("n") > 1)

  /** Learn `nMerges` merges from a corpus of `text`. Returns the merge
    * list in training order. Stops early when no pair repeats.
    *
    * Round state: the vocabulary AND the pair-count table, both
    * localCheckpoint'ed so lineage stays flat across thousands of
    * rounds (the d19 discipline). Each round:
    *  1. argmax over the maintained pair table (1-row collect);
    *  2. split the vocabulary on the affected-word predicate;
    *  3. pair delta = counts(merged affected) - counts(affected),
    *     folded into the table with one pair-table-sized grouped sum —
    *     exact integer arithmetic, so the maintained table equals a
    *     full recount at every round (pinned against the single-node
    *     reference in BpeSpec, incl. a 256-merge property case). */
  def learnMerges(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    var vocab = initialVocab(docs).localCheckpoint(true)
    var pairs = pairCountsAll(vocab).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      val top = pairs.where(col("n") > 1)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) continue = false
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val hit = expr(containsPairExpr("syms", a, b))
        val affected = vocab.where(hit)
        // merged twice below (delta + next vocab) — affected is the
        // small side by construction and both uses land in the same
        // round's checkpoints, so a third materialization job would
        // cost more than the re-evaluation
        val merged = affected
          .select(expr(mergeExpr("syms", a, b)).as("syms"), col("c"))
        val delta = pairCountsAll(merged).unionByName(
          pairCountsAll(affected)
            .select(col("a"), col("b"), (-col("n")).as("n")))
        val nextPairs = pairs.unionByName(delta)
          .groupBy(col("a"), col("b")).agg(sum(col("n")).as("n"))
          .where(col("n") > 0)
          .localCheckpoint(true)
        // coalesce before the checkpoint: union CONCATENATES partition
        // lists, so without the cap the vocabulary frame gains a
        // partition set per round and round-k jobs schedule O(k) tasks
        // — quadratic total task count over a long training run. The
        // cap is narrow (no shuffle) and keeps every round's job at
        // core-count tasks.
        val nextVocab = vocab.where(!hit).unionByName(merged)
          .coalesce(docs.sparkSession.sparkContext.defaultParallelism)
          .localCheckpoint(true)
        pairs.unpersist(false)
        vocab.unpersist(false)
        pairs = nextPairs
        vocab = nextVocab
      }
    }
    vocab.unpersist(false)
    pairs.unpersist(false)
    merges.toSeq
  }

  /** Segment `wordCol` into `outCol` with a learned merge list — the
    * encode path, the SAME fold the trainer applied, in the same
    * order. Applied as one projection per merge (NOT one nested
    * expression: each fold references its input six times, so textual
    * inlining would grow 6^|merges|; chained column rewrites keep the
    * plan linear — Catalyst does not collapse a multiply-referenced
    * non-cheap alias), with a localCheckpoint every `checkpointEvery`
    * merges so the ANALYZED plan depth stays bounded at production
    * merge counts (a 16k-projection plan is deep into the analyzer's
    * superlinear regime). Merge lists within one chunk keep today's
    * fully-lazy behavior. */
  def applyMerges(
      df: DataFrame, wordCol: String, outCol: String,
      merges: Seq[(String, String)],
      checkpointEvery: Int = 64): DataFrame = {
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    val init = df.withColumn(outCol, chars(col(wordCol)))
    def chunkFold(d: DataFrame, chunk: Seq[(String, String)]): DataFrame =
      chunk.foldLeft(d) {
        case (dd, (a, b)) =>
          dd.withColumn(outCol, expr(mergeExpr(outCol, a, b)))
      }
    if (merges.size <= checkpointEvery) chunkFold(init, merges)
    else merges.grouped(checkpointEvery).foldLeft(init) { (d, chunk) =>
      chunkFold(d, chunk).localCheckpoint(true)
    }
  }

  /** Doc-level encode: apply the merge fold to EVERY word of a token
    * ARRAY column in place — `toksCol: Array[String]` becomes `outCol:
    * Array[Array[String]]` (one symbol array per word, in word order).
    * Merges never cross word boundaries (each word folds
    * independently, the standard BPE pre-tokenization contract).
    *
    * This is the SHUFFLE-FREE encode shape for whole corpora: the
    * per-word alternative (explode positions -> encode the distinct
    * vocabulary -> join back -> regroup) pays two corpus-token-sized
    * exchanges for its vocabulary dedup; this one is a map-only chain
    * of projections — the same one-projection-per-merge /
    * checkpoint-every-N plan-depth discipline as [[applyMerges]], with
    * the same fold rule (a nested lambda over the same
    * [[mergeExpr]]), so the two encode paths cannot diverge. NOTE:
    * past `checkpointEvery` merges the localCheckpoint materializes
    * the (corpus-sized) frame; for production merge counts over a full
    * corpus prefer encoding the distinct vocabulary via [[applyMerges]]
    * and mapping words through it, or raise `checkpointEvery`. */
  /** PRODUCTION-SCALE encode: one broadcast merge-rank table, ONE
    * projection, any merge count (round-10 verdict item 4 — the
    * chained-projection encode is the right shape at the 16 gated
    * merges but a 16k-merge production tokenizer would mean thousands
    * of whole-stage-codegen units and a plan deep into the analyzer's
    * superlinear regime; t39's 7× driver-window swing already showed
    * the codegen-compile sensitivity).
    *
    * Semantics are PROVABLY identical to the sequential fold
    * ([[applyMerges]] — and therefore to the trainer and the t39
    * oracle): the per-word loop applies, among the pairs PRESENT in
    * the word, the one with the lowest rank STRICTLY ABOVE the last
    * applied rank — i.e. it walks the merge list in training order,
    * skipping absent pairs in O(1) instead of paying a projection for
    * them. The monotone-rank constraint is load-bearing: two merges
    * may produce the SAME symbol string (("a","bc") and ("ab","c")
    * both make "abc"), so a later merge can create an occurrence of
    * an EARLIER pair — the sequential fold (whose round has already
    * passed) leaves it unmerged, and so does this loop; an
    * unconstrained min-rank loop would diverge exactly there (pinned
    * with that adversarial list in `BpeSpec`).
    *
    * Cost: O(|word| × distinct-applicable-ranks) per word, rank
    * lookups O(1) from one broadcast map — no per-merge plan growth,
    * no shuffle; the (word, rank-scan) loop lives in a single
    * deterministic UDF projection. This is the intended path for
    * production merge counts; the fold path stays as the
    * spec-pinned reference semantics and the oracle bridge. */
  def encodeWithRanks(
      df: DataFrame, toksCol: String, outCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val pairs = merges.toArray
    val rank: Map[(String, String), Int] =
      pairs.iterator.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val bc = df.sparkSession.sparkContext.broadcast((pairs, rank))
    val enc = udf { (toks: Seq[String]) =>
      val (ps, rk) = bc.value
      toks.map(w => encodeWord(w.split(""), ps, rk).toSeq)
    }
    df.withColumn(outCol, enc(col(toksCol)))
  }

  /** The monotone-rank merge loop for one word (see
    * [[encodeWithRanks]]): repeatedly apply the lowest-ranked present
    * pair with rank above the last applied one, as a left-to-right
    * non-overlapping pass — the exact [[mergeExpr]] rule. */
  private def encodeWord(
      syms0: Array[String], pairs: Array[(String, String)],
      rank: Map[(String, String), Int]): Array[String] = {
    var syms = syms0
    var lastR = -1
    var continue = syms.length > 1
    while (continue) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))) match {
          case Some(r) if r > lastR && r < best => best = r
          case _ => ()
        }
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        val (a, b) = pairs(best)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        lastR = best
        continue = syms.length > 1
      }
    }
    syms
  }

  def applyMergesToArray(
      df: DataFrame, toksCol: String, outCol: String,
      merges: Seq[(String, String)],
      checkpointEvery: Int = 64): DataFrame = {
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    val init = df.withColumn(outCol,
      expr(s"transform($toksCol, w -> split(w, ''))"))
    def chunkFold(d: DataFrame, chunk: Seq[(String, String)]): DataFrame =
      chunk.foldLeft(d) {
        case (dd, (a, b)) =>
          dd.withColumn(outCol,
            expr(s"transform($outCol, w -> ${mergeExpr("w", a, b)})"))
      }
    if (merges.size <= checkpointEvery) chunkFold(init, merges)
    else merges.grouped(checkpointEvery).foldLeft(init) { (d, chunk) =>
      chunkFold(d, chunk).localCheckpoint(true)
    }
  }
}
