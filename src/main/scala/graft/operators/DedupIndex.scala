package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted LSH dedup index — the text-side analog of [[AnnIndex]].
  *
  * Batch d04 answers "which documents in THIS corpus are near-dups of
  * each other"; an intake pipeline asks the incremental question: "is
  * this NEW document a near-dup of anything already ingested?" —
  * thousands of times a day, against a corpus that must not be rescanned
  * per probe. The standard answer is the same inverted layout IVF uses
  * for vectors, applied to MinHash bands:
  *
  *  - `<root>/bands` — one row per (document, band): doc_id, the band's
  *    bucket hash `bh`, and the full 16-slot signature for estimated-
  *    Jaccard scoring, PARTITIONED BY (band, pfx) where `pfx` is the
  *    first hex char of `bh` — 4 bands x 16 prefixes = 64 directories,
  *    one file each, so a probe's (band, pfx) predicate prunes to the
  *    probed buckets' files (the s05 partition-pruning argument, pinned
  *    in `DedupIndexSpec`). The prefix width is the granularity knob:
  *    one hex char keeps the bench-scale index at 64 well-sized files
  *    (a 256-prefix layout measured 5x slower probes from tiny-file
  *    footer reads alone); at 100 TB widen to 2-3 chars so each
  *    directory stays in the hundreds-of-MB range and a probe reads
  *    ~4/4096 of the index instead of all of it.
  *
  * Probing computes the query documents' signatures with EXACTLY the
  * batch banding (shared [[graft.queries.Dedup.bandedFromText]] /
  * signature expressions — streamed, indexed and batch decisions can
  * never diverge), broadcasts the tiny probe set, and equi-joins on
  * (band, bh) inside the pruned partitions. The probed (band, pfx) keys
  * are collected to the driver *by construction a tiny set* (<= 4 per
  * probe doc) — that literal predicate is what turns the index scan
  * into directory pruning.
  */
object DedupIndex {
  /** Deterministic per-dataset index location (idempotent rebuild skip),
    * content-fingerprinted by the documents source
    * ([[graft.core.IndexRoot]]) so a rewritten corpus gets a fresh
    * root. */
  def defaultRoot(sfDir: String): String =
    // _v2: the minhash slot-hash family changed (per-slot independent
    // combinations — HashExpressions.SlotC2); an index of old-family
    // signatures must not serve new-family probes
    graft.core.IndexRoot.of(sfDir, "documents.parquet", "graft_dedup_index_v2")

  /** Build the banded-signature index unless it already exists (marker:
    * bands/_SUCCESS). One corpus pass total. */
  def buildIfMissing(spark: SparkSession, sfDir: String, root: String): Unit = {
    val marker = new Path(s"$root/bands/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return
    invalidate(root)
    graft.queries.Dedup.bandedWithSig(spark, sfDir)
      .withColumn("pfx", substring(col("bh"), 1, 1))
      .repartition(64, col("band"), col("pfx")) // one file per directory
      .write.mode("overwrite").partitionBy("band", "pfx")
      .parquet(s"$root/bands")
  }

  /** Incrementally merge NEW documents (doc_id, text) into an existing
    * index — the intake-pipeline maintenance path: band the delta with
    * the SAME shared signature/banding expressions the build uses and
    * append files into the touched (band, pfx) directories only. By
    * construction the merged index equals a full rebuild over
    * base ∪ delta (pinned in `DedupIndexSpec`): the layout is a plain
    * union of banded rows, and probing is an equi-join over it.
    *
    * Each append adds at most one file per touched directory, so
    * file-count grows linearly in append batches, not documents —
    * run [[compactFiles]] when probe latency starts paying too many
    * footer reads (the same maintenance cadence any LSM-ish layout
    * needs). */
  def append(spark: SparkSession, root: String, newDocs: DataFrame): Unit = {
    graft.queries.Dedup.bandedWithSigFromText(
        newDocs.select(col("doc_id"), col("text")))
      .withColumn("pfx", substring(col("bh"), 1, 1))
      .repartition(64, col("band"), col("pfx"))
      .write.mode("append").partitionBy("band", "pfx")
      .parquet(s"$root/bands")
    invalidate(root) // next probe must see the appended files
  }

  /** The latest published fold sequence number; -1 when never
    * compacted. Folds are numbered like stream batch ids, so the
    * shared [[Generations]] machinery applies unchanged. */
  private def latestSeq(spark: SparkSession, root: String): Long =
    Generations.cutoff(spark, root)

  /** `band=*` directories currently under the append zone (empty right
    * after a full compaction — appends recreate them). */
  private def bandDirs(spark: SparkSession, root: String): Seq[Path] = {
    val p = new Path(s"$root/bands")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("band="))
      .map(_.getPath)
  }

  /** Banded rows of the whole index: the latest fold (if published)
    * plus everything appended since. Partition-column types are
    * canonicalized on BOTH legs (band INT, pfx STRING) — partition
    * discovery infers types per directory tree, and a post-compaction
    * append batch whose `pfx` values happen to be all digits would
    * otherwise type one leg INT and break the union (the
    * InvertedIndex digit-only-pfx lesson). */
  private def bandsDf(spark: SparkSession, root: String): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.select(col("doc_id"), col("sig"), col("band").cast("int"),
        col("bh"), col("pfx").cast("string"))
    val folded = Generations.live(spark, root)
      .map(g => canon(read(spark, g.path.toString)))
    val live =
      if (bandDirs(spark, root).nonEmpty)
        Some(canon(read(spark, s"$root/bands")))
      else None
    val layers = folded ++ live
    require(layers.nonEmpty, s"no dedup index data under $root")
    layers.reduce(_ unionByName _)
  }

  private def writeBanded(df: DataFrame, dest: String): Unit =
    df.repartition(64, col("band"), col("pfx")) // one file per directory
      .write.mode("overwrite").partitionBy("band", "pfx")
      .parquet(dest)

  /** Fold the append zone's accumulated files into ONE file per
    * (band, pfx) directory under a fresh generation
    * `compacted/gen-<seq>-<seq>`, then run size-tiered generation
    * merges — the [[graft.operators.InvertedIndex.compactBatches]]
    * generational protocol applied to the third index, whose growth
    * axis is FILES per directory rather than batch directories
    * (round-10 verdict item 1: the previous design re-folded the
    * whole previous generation into every compaction — a full-index
    * rewrite per cycle). A fresh fold writes ONLY the append zone;
    * adjacent generations merge when the newer reaches `mergeRatio` ×
    * the older's bytes ([[Generations.mergeDue]]) — O(log n) live
    * generations, O(n log n) lifetime write volume.
    *
    * The crash protocol is simpler here because the index is a BAG
    * whose probe ends in `.distinct()`: stage, publish with one atomic
    * rename, then delete the folded band directories and subsumed
    * generations. A crash between publish and cleanup leaves rows
    * present in BOTH the new fold and the append zone — the probe's
    * distinct collapses them, so every crash window is probe-identical,
    * not merely recoverable (pinned in `DedupIndexSpec`, which
    * re-appends a folded batch to manufacture exactly that double
    * representation). Replay safety under streaming maintenance is
    * unchanged for the same reason: a replayed batch re-appends rows
    * a generation already holds, and they collapse.
    *
    * Contract: single maintainer — do not run concurrently with an
    * [[append]] (a file landing between the fold's read and its
    * cleanup would be deleted unfolded). Between drains of a cleanly
    * stopped maintenance stream is the intended cadence. Returns the
    * published fold sequence, or None when there is nothing new. */
  def compactFiles(
      spark: SparkSession, root: String,
      mergeRatio: Double = Generations.DefaultMergeRatio): Option[Long] = {
    val f = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val live = bandDirs(spark, root)
    if (live.isEmpty) return None // nothing appended since the last fold
    val seq = latestSeq(spark, root) + 1
    val staging = s"$root/.compact-${java.util.UUID.randomUUID()}"
    // fold ONLY the append zone — never the previous generations
    writeBanded(
      read(spark, s"$root/bands")
        .select(col("doc_id"), col("sig"), col("band").cast("int"),
          col("bh"), col("pfx").cast("string")),
      staging)
    Generations.publish(spark, root, staging, seq, seq)
    live.foreach(d => f.delete(d, true))
    Generations.cleanup(spark, root, Nil)
    mergeGenerations(spark, root, mergeRatio)
    invalidate(root)
    Some(seq)
  }

  /** Cascade size-tiered merges of adjacent generations — one file per
    * (band, pfx) directory again after each merge, so probe-side file
    * counts stay O(64 × live generations) = O(64 log n). */
  private def mergeGenerations(
      spark: SparkSession, root: String, ratio: Double): Unit = {
    var gens = Generations.live(spark, root)
    var due = Generations.mergeDue(gens, ratio)
    while (due.isDefined) {
      val (older, newer) = due.get
      val staging = s"$root/.compact-${java.util.UUID.randomUUID()}"
      // load each generation separately (two partitioned trees cannot
      // share one multi-path read), canonicalizing partition-column
      // types PER LEG — one tree's all-digit pfx values must not
      // break the union (the digit-only-pfx lesson)
      def leg(path: org.apache.hadoop.fs.Path) =
        spark.read.parquet(path.toString)
          .select(col("doc_id"), col("sig"), col("band").cast("int"),
            col("bh"), col("pfx").cast("string"))
      writeBanded(leg(older.path).unionByName(leg(newer.path)), staging)
      Generations.publish(spark, root, staging, older.lo, newer.hi)
      Generations.cleanup(spark, root, Nil)
      gens = Generations.live(spark, root)
      due = Generations.mergeDue(gens, ratio)
    }
  }

  private val readCache = new graft.core.SessionCache[String]()

  private def read(spark: SparkSession, path: String): DataFrame =
    readCache.getOrElseUpdate(spark, path)(spark.read.parquet(path))

  private def invalidate(root: String): Unit =
    readCache.invalidateWhere(_.startsWith(root))

  /** Probe the index with banded query rows
    * (q_id, sig, band, bh — [[graft.queries.Dedup.bandedWithSig]]
    * output renamed): emit every indexed document sharing a band bucket
    * with a probe, scored by estimated Jaccard (matching signature
    * fraction, the d04 formula). Output: (q_id, c_id, est_sim). */
  def probe(spark: SparkSession, root: String, probes: DataFrame): DataFrame = {
    // Materialize the banded probe set ONCE (localCheckpoint): it is
    // consumed twice — the driver-side key collect below and the
    // broadcast join — and the banding pipeline behind it (tokenize →
    // shingle → MinHash → band md5) is the expensive part of a probe;
    // without the barrier every call pays it twice. Checkpoint blocks
    // are freed by the ContextCleaner when the probe result is dropped.
    val banded = probes.localCheckpoint(true)
    // The probed (band, pfx) key set: <= 4 per probe doc AND bounded by
    // the layout itself (4 bands x 16 prefixes = 64 keys max), so the
    // driver-side collect and the IN-list stay tiny no matter how many
    // documents are probed. One flat IN over a concat of the partition
    // columns — it references only partition attributes, so it prunes
    // directories exactly like a per-key conjunction, without the
    // 2000-deep OR tree that overflows the column-conversion stack at
    // large probe counts.
    val keys = banded
      .select(concat_ws("/", col("band"), substring(col("bh"), 1, 1)).as("k"))
      .distinct().collect().map(_.getString(0))
    val pruned: Column =
      if (keys.isEmpty) lit(false)
      else concat_ws("/", col("band"), col("pfx")).isin(keys.toSeq: _*)
    bandsDf(spark, root)
      .filter(pruned)
      .select(col("doc_id").as("c_id"), col("sig").as("c_sig"),
        col("band"), col("bh"))
      .join(broadcast(banded.select(col("doc_id").as("q_id"),
        col("sig").as("q_sig"), col("band"), col("bh"))),
        Seq("band", "bh"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        graft.queries.Dedup.estSim("q_sig", "c_sig").as("est_sim"))
      .distinct() // a pair sharing two bands collides twice
  }
}
