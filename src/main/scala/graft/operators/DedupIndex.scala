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
    graft.core.IndexRoot.of(sfDir, "documents.parquet", "graft_dedup_index")

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
    * run [[graft.lake.Lake.compact]] on `<root>/bands` when probe
    * latency starts paying too many footer reads (the same maintenance
    * cadence any LSM-ish layout needs). */
  def append(spark: SparkSession, root: String, newDocs: DataFrame): Unit = {
    graft.queries.Dedup.bandedWithSigFromText(
        newDocs.select(col("doc_id"), col("text")))
      .withColumn("pfx", substring(col("bh"), 1, 1))
      .repartition(64, col("band"), col("pfx"))
      .write.mode("append").partitionBy("band", "pfx")
      .parquet(s"$root/bands")
    invalidate(root) // next probe must see the appended files
  }

  private val readCache = new graft.core.SessionCache[String]()

  private def read(spark: SparkSession, path: String): DataFrame =
    readCache.getOrElseUpdate(spark, path)(spark.read.parquet(path))

  private def invalidate(root: String): Unit =
    readCache.invalidateWhere(_ == s"$root/bands")

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
    read(spark, s"$root/bands")
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
