package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental near-duplicate detection over a DOCUMENT stream — the
  * ingestion-time twin of the batch d04 LSH join: as new crawl shards
  * arrive, each document's MinHash signature is banded with EXACTLY the
  * batch banding expression ([[graft.queries.Dedup.bandedFromText]]), and
  * a stateful per-bucket membership check emits a candidate pair the
  * moment a new document lands in a bucket that already holds others.
  * Run over the same corpus, the distinct candidate set is identical to
  * the batch join's (pinned by `DedupStreamSpec`) — dedup does not need a
  * nightly recompute; it can gate ingestion.
  *
  * Scale shape: state is keyed by (band, bucket-hash), so it shards
  * across executors like any grouped state and each key holds only that
  * bucket's doc ids. Buckets are small by construction (a bucket is a
  * 1-in-2^60 hash collision unless the documents genuinely share a band,
  * which is what LSH makes rare for non-near-dups); a degenerate bucket —
  * a boilerplate band shared by millions of pages — is capped at
  * `maxBucket` RETAINED ids: every incoming doc still pairs against the
  * retained members (the canonical early arrivals), which is the standard
  * recall/state trade for streaming LSH. With checkpointing the state
  * store persists across restarts, so the detector resumes where the
  * previous run stopped.
  */
object DedupStream {
  /** One banded membership row (input). */
  final case class BandedDoc(doc_id: Long, band: Int, bh: String)

  /** Retained ids of one LSH bucket (state). */
  final case class BucketState(ids: List[Long])

  /** Emitted candidate pair, a_id < b_id (output). May repeat across
    * BUCKETS (a pair sharing two bands emits twice, exactly like the
    * batch join before its dropDuplicates), and — once a bucket has
    * EVICTED members past `maxBucket` — an at-least-once source that
    * re-delivers an evicted id will re-emit its pairs (the evicted id no
    * longer appears in state, so it looks fresh). Within-cap buckets are
    * exactly-once per (pair, bucket); consumers needing global
    * exactly-once apply `dropDuplicates`, as the batch twin does. */
  final case class CandidatePair(a_id: Long, b_id: Long, band: Int, bh: String)

  /** Band a (streaming or batch) `(doc_id, text)` relation. */
  def banded(docs: DataFrame): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    graft.queries.Dedup.bandedFromText(docs).as[BandedDoc]
  }

  /** Pure bucket-admission step: pair each arriving id against retained
    * members (then among the arrivals themselves, in sorted order — so a
    * batch containing a whole bucket emits the same pairs as N
    * single-doc batches), and produce the next retained-member list
    * (oldest-first, capped). Factored out of the streaming closure so
    * its batch-split invariance is property-testable without a streaming
    * harness.
    *
    * The cap bounds BOTH state and work, including within one batch: a
    * degenerate bucket receiving a million docs in a single trigger
    * pairs each of them against at most `maxBucket` retained members
    * (O(n·cap) emissions), never against the whole uncapped batch
    * (O(n²)). Ids beyond the cap are pair sources but not pair targets —
    * the standard recall/state trade, applied uniformly so batch
    * boundaries don't change which pairs exist. */
  private[streaming] def admit(
      seen: List[Long],
      arriving: Seq[Long],
      maxBucket: Int): (Seq[(Long, Long)], List[Long]) = {
    val fresh = arriving.distinct.sorted.filterNot(seen.contains)
    val out = Seq.newBuilder[(Long, Long)]
    var members = seen // oldest-first, so the cap keeps early arrivals
    fresh.foreach { n =>
      members.foreach(m => out += (if (m < n) (m, n) else (n, m)))
      if (members.size < maxBucket) members = members :+ n
    }
    (out.result(), members)
  }

  /** One digest arrival (input to [[exactDedup]]). */
  final case class DigestDoc(doc_id: Long, fp: String)

  /** Canonical holder of one content digest (state of [[exactDedup]]):
    * 8 bytes + the digest key per DISTINCT document ever seen. */
  final case class CanonicalState(canonical_id: Long)

  /** Admission decision for one arriving document (output of
    * [[exactDedup]]): `admitted` iff this doc established its digest;
    * duplicates carry the canonical they collided with. */
  final case class Admission(
      doc_id: Long, fp: String, canonical_id: Long, admitted: Boolean)

  /** Pure admission step for one digest group, factored out like
    * [[admit]] so its invariants are testable without a streaming
    * harness: the FIRST batch to present a digest admits that batch's
    * minimum arriving doc_id; every later arrival is marked duplicate
    * against the stored canonical. The split-invariant property is
    * "exactly one admission per digest, all duplicates point at it" —
    * WHICH doc is admitted depends on arrival order across batches
    * (first-come wins, min-id only within the establishing batch), so
    * the admitted doc equals batch d01's global-min canonical exactly
    * when arrivals respect doc_id order (the ordered-feed case
    * `DedupStreamSpec` pins). */
  private[streaming] def admitDigest(
      canonical: Option[Long], arriving: Seq[Long]): (Seq[(Long, Long, Boolean)], Long) = {
    val arr = arriving.distinct.sorted
    canonical match {
      case Some(c) => (arr.map(id => (id, c, false)), c)
      case None =>
        val c = arr.min
        (arr.map(id => (id, c, id == c)), c)
    }
  }

  /** Ingestion-time EXACT dedup — the streaming twin of batch d01: each
    * arriving document is digested with EXACTLY the batch expression
    * (md5 of the text — one shared formula, so streamed and batch
    * dedup can never diverge) and admitted iff its digest is new; later
    * copies are emitted as rejected duplicates pointing at the admitted
    * canonical. Fed in doc_id order the admitted set is byte-identical
    * to d01's canonical set; under arbitrary sharding the admitted set
    * is one doc per digest group with the same group partition
    * (`DedupStreamSpec`). State is one long per distinct document —
    * the cheapest stateful stage of an intake pipeline, in front of
    * [[lshCandidates]]'s per-bucket state. */
  def exactDedup(docs: DataFrame): Dataset[Admission] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, md5}
    docs.select(col("doc_id").cast("long").as("doc_id"),
        md5(col("text")).as("fp"))
      .as[DigestDoc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState[CanonicalState, Admission](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (fp, rows, state: GroupState[CanonicalState]) =>
          val (decisions, canon) = admitDigest(
            state.getOption.map(_.canonical_id), rows.map(_.doc_id).toSeq)
          state.update(CanonicalState(canon))
          decisions.iterator.map { case (id, c, adm) =>
            Admission(id, fp, c, adm)
          }
      }
  }

  /** Stateful bucket membership: every new doc pairs against the bucket's
    * retained members, then joins them. Append-mode compatible
    * (`flatMapGroupsWithState` + NoTimeout — bucket membership has no
    * event-time horizon; eviction is the `maxBucket` cap). */
  def lshCandidates(
      bandedDocs: Dataset[BandedDoc],
      maxBucket: Int = 1024): Dataset[CandidatePair] = {
    import bandedDocs.sparkSession.implicits._
    bandedDocs
      .groupByKey(b => (b.band, b.bh))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, bh), rows, state: GroupState[BucketState]) =>
          val seen = state.getOption.map(_.ids).getOrElse(Nil)
          val (pairs, members) =
            admit(seen, rows.map(_.doc_id).toSeq, maxBucket)
          state.update(BucketState(members))
          pairs.iterator.map { case (a, b) => CandidatePair(a, b, band, bh) }
      }
  }
}
