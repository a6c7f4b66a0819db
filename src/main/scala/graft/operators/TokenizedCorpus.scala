package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenize-once retrieval (round-11 verdict item 4): a persisted,
  * incrementally maintained tokenization of a [[graft.lake.SnapshotTable]]
  * corpus — the postings-build intermediate `(doc_id, dl, tok, tf)`,
  * a per-partition corpus-stats table, and (round 16) a per-partition
  * term-df table, all themselves SnapshotTables partitioned BY THE
  * BASE'S PARTITION COLUMNS.
  *
  * Why: tokenization (`regexp_extract_all` + explode) is the named
  * constant factor of every inline text query — the round-11 bench
  * shows the inline BM25 shapes paying 3.4-4.1× DuckDB almost entirely
  * in re-tokenizing text that has not changed since the last query. At
  * 100 TB the corpus mutates a few partitions per CDC batch while
  * every retrieval/statistics query re-reads all of it; tokenizing
  * once per DOCUMENT VERSION instead of once per QUERY is the same
  * write-once-read-many argument as the inverted index, kept in a
  * shape (flat postings rows, base-aligned partitions) that ANY
  * downstream aggregation can consume, not just term probes.
  *
  * Partition alignment is what makes maintenance trivial AND bounded:
  * the derived tables inherit the base's partition tuple, so the base's
  * manifest diff (changed tuples between the last-applied version and
  * latest — metadata-sized, no data comparison) names exactly the
  * derived partitions to re-derive. [[refresh]] re-tokenizes ONLY the
  * changed partitions' rows and swaps them in with
  * [[graft.lake.SnapshotTable.overwritePartitions]] — one atomic
  * commit per table, cost O(changed data), never O(corpus).
  *
  * Serving shapes, by access pattern:
  *  - [[postings]] — the full intermediate, for corpus-wide analytics
  *    and batched retrieval (hundreds of distinct terms): one scan.
  *  - [[postingsForTerms]] — few-term probes: postings rows are
  *    range-clustered on `tok` with per-file stats declared, so each
  *    term resolves through the manifest's file census
  *    ([[graft.lake.SnapshotTable.readBetween]]) and opens only the
  *    stat-matching files — the lakehouse skip-read doing inverted-
  *    index duty, no separate index structure.
  *  - [[corpusStats]] — N and total_dl come from the per-partition
  *    stats table (one row per partition tuple), so corpus totals are
  *    an O(|partitions|) aggregate, never an O(docs) scan.
  *
  * Tokenization rule is [[graft.queries.Text.toksExpr]] — the SAME
  * expression the inline queries and the inverted index use, so a
  * ranking served from this table can never diverge on tokenization
  * (pinned in `TokenizedCorpusSpec` and oracle-gated via t46).
  *
  * Crash/replay: `_tok/applied` records the reflected base version and
  * is written AFTER both table commits; a crash in between replays the
  * same partition overwrites (same content, idempotent) on the next
  * refresh. Single-maintainer, like the MV layer. */
object TokenizedCorpus {
  import graft.lake.SnapshotTable

  /** Files per postings partition: >1 so the tok-range clustering
    * yields narrow per-file [min,max] windows for the skip-read. */
  val PostingsFiles = 8

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def postingsRoot(tokRoot: String): String =
    new Path(tokRoot, "postings").toString
  def statsRoot(tokRoot: String): String =
    new Path(tokRoot, "stats").toString
  def dfRoot(tokRoot: String): String =
    new Path(tokRoot, "df").toString

  private def appliedPath(tokRoot: String) =
    new Path(tokRoot, "_tok/applied")

  /** Base version the tokenized tables reflect (None: never built). */
  def appliedBaseVersion(
      spark: SparkSession, tokRoot: String): Option[Int] = {
    val f = fs(spark, tokRoot)
    val p = appliedPath(tokRoot)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toInt)
      finally in.close()
    }
  }

  private def writeApplied(
      spark: SparkSession, tokRoot: String, v: Int): Unit = {
    val f = fs(spark, tokRoot)
    f.mkdirs(new Path(tokRoot, "_tok"))
    val tmp = new Path(tokRoot,
      s"_tok/.applied.${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // plain rename, not create-exclusive: the marker is single-
    // maintainer AND advisory — a torn/missing marker only means the
    // next refresh replays idempotent partition overwrites
    f.delete(appliedPath(tokRoot), false)
    if (!f.rename(tmp, appliedPath(tokRoot)))
      throw new java.io.IOException(
        s"tokenized-corpus marker rename failed under $tokRoot")
  }

  /** The ONE tokenization pass a refresh pays: documents whose
    * tokenization is empty contribute NOTHING (dl = 0 documents are
    * outside every BM25/statistics denominator, same rule as
    * [[graft.queries.Search.tokenized]]). Callers cache this and
    * derive BOTH tables from it — tokenizing twice per refresh would
    * re-pay the exact constant this module exists to eliminate. */
  private def tokenizedFrame(docs: DataFrame): DataFrame =
    docs.withColumn("toks", expr(graft.queries.Text.toksExpr))
      .withColumn("dl", size(col("toks")).cast("long"))
      .where(col("dl") > 0)

  /** `(partition cols…, doc_id, dl, tok, tf)` off a [[tokenizedFrame]]. */
  private def postingsFrame(
      tok: DataFrame, partitionBy: Seq[String]): DataFrame = {
    val part = partitionBy.map(col)
    tok.select(part :+ col("doc_id") :+ col("dl") :+
        explode(col("toks")).as("tok"): _*)
      .groupBy(part :+ col("doc_id") :+ col("dl") :+ col("tok"): _*)
      .agg(count(lit(1)).as("tf"))
  }

  /** One row per partition tuple: `(partition cols…, n_docs,
    * total_dl)` off a [[tokenizedFrame]]. */
  private def statsFrame(
      tok: DataFrame, partitionBy: Seq[String]): DataFrame =
    tok.groupBy(partitionBy.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))

  /** One row per (partition tuple, term): that partition's document
    * frequency — a posting row is one (doc, term) pair, so the per-
    * partition count IS the df contribution, and a doc lives in exactly
    * one partition, so corpus df = the sum across partitions. Derived
    * from a [[postingsFrame]], maintained partition-aligned like the
    * other two tables (round-15 verdict item 2: this removes the
    * second postings pass — and with it the cache barrier — from every
    * tokenized-served BM25 query; df becomes a term-pruned read of a
    * vocabulary-sized table instead of a re-aggregation of the
    * workload's postings). */
  private def dfFrame(
      postings: DataFrame, partitionBy: Seq[String]): DataFrame =
    postings.groupBy(partitionBy.map(col) :+ col("tok"): _*)
      .agg(count(lit(1)).as("df"))

  /** Bring the tokenized tables up to the base's LATEST version.
    * First call builds them in full; later calls re-tokenize ONLY the
    * partitions whose base directories changed (manifest diff) and
    * overwrite those partitions in place — dropped base partitions
    * drop here too. Returns the applied base version. No-op when
    * already current. */
  def refresh(
      spark: SparkSession, baseRoot: String, tokRoot: String,
      partitionBy: Seq[String]): Int = {
    // hint + forward probe (SnapshotTable.latest), NOT a _versions
    // listing: per-batch CDC maintenance calls refresh every few
    // minutes, and this resolution is the only metadata it pays on the
    // already-current path (round-12 advice item 2 — the old
    // versions().last here re-paid the O(retained-versions) LIST the
    // hint pointer exists to eliminate, up to three times per call)
    val latestB = SnapshotTable.latest(spark, baseRoot).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot-table version committed under $baseRoot"))
    appliedBaseVersion(spark, tokRoot) match {
      case Some(v) if v == latestB =>
        // migration backfill: a tokRoot built before the df table
        // existed (round 16) derives it once from the CURRENT postings
        // table — one postings scan, no tokenization
        if (SnapshotTable.versions(spark, dfRoot(tokRoot)).isEmpty)
          SnapshotTable.overwritePartitions(spark, dfRoot(tokRoot),
            dfFrame(postings(spark, tokRoot), partitionBy), partitionBy,
            statsFor = Seq("tok"), clusterBy = Seq("tok"))
        latestB
      case Some(v) if SnapshotTable.hasVersion(spark, baseRoot, v) =>
        val oldMap = SnapshotTable.entriesFor(spark, baseRoot, v).toMap
        val newMap = SnapshotTable.entriesFor(spark, baseRoot, latestB).toMap
        val changed = (oldMap.keySet ++ newMap.keySet)
          .filter(k => oldMap.get(k) != newMap.get(k))
        if (changed.nonEmpty) {
          val changedDocs =
            if (changed.forall(k => !newMap.contains(k)))
              SnapshotTable.read(spark, baseRoot, latestB).limit(0)
            else SnapshotTable.readPartitionKeys(
              spark, baseRoot, changed, latestB)
          val tok = tokenizedFrame(changedDocs).cache()
          // the postings frame feeds BOTH the postings overwrite and
          // the df derivation — cache it so the explode+tf aggregate
          // runs once per refresh
          val pf = postingsFrame(tok, partitionBy).cache()
          // dropKeys = every changed tuple: present ones are also in
          // the recomputed rows (so they rewrite), vanished or
          // all-empty-tokenization ones tombstone
          try {
            SnapshotTable.overwritePartitions(spark, postingsRoot(tokRoot),
              pf, partitionBy,
              dropKeys = changed, filesPerPartition = PostingsFiles)
            SnapshotTable.overwritePartitions(spark, statsRoot(tokRoot),
              statsFrame(tok, partitionBy), partitionBy,
              dropKeys = changed)
            maintainDf(spark, tokRoot, partitionBy, pf, changed)
          } finally { pf.unpersist(false); tok.unpersist(false) }
        } else if (SnapshotTable.versions(spark, dfRoot(tokRoot)).isEmpty)
          // zero changed partitions but df missing: same backfill as
          // the already-current branch
          SnapshotTable.overwritePartitions(spark, dfRoot(tokRoot),
            dfFrame(postings(spark, tokRoot), partitionBy), partitionBy,
            statsFor = Seq("tok"), clusterBy = Seq("tok"))
        writeApplied(spark, tokRoot, latestB)
        latestB
      case _ =>
        // never built, or the applied version was vacuumed away:
        // full (re)build against base@latest
        val tok = tokenizedFrame(
          SnapshotTable.read(spark, baseRoot, latestB)).cache()
        val pf = postingsFrame(tok, partitionBy).cache()
        def staleKeys(root: String): Set[String] =
          SnapshotTable.latest(spark, root)
            .map(v => SnapshotTable.entriesFor(spark, root, v)
              .map(_._1).toSet).getOrElse(Set.empty)
        try {
          SnapshotTable.overwritePartitions(spark, postingsRoot(tokRoot),
            pf, partitionBy,
            dropKeys = staleKeys(postingsRoot(tokRoot)),
            filesPerPartition = PostingsFiles,
            statsFor = Seq("tok"), clusterBy = Seq("tok"))
          SnapshotTable.overwritePartitions(spark, statsRoot(tokRoot),
            statsFrame(tok, partitionBy), partitionBy,
            dropKeys = staleKeys(statsRoot(tokRoot)))
          SnapshotTable.overwritePartitions(spark, dfRoot(tokRoot),
            dfFrame(pf, partitionBy), partitionBy,
            dropKeys = staleKeys(dfRoot(tokRoot)),
            statsFor = Seq("tok"), clusterBy = Seq("tok"))
        } finally { pf.unpersist(false); tok.unpersist(false) }
        writeApplied(spark, tokRoot, latestB)
        latestB
    }
  }

  /** Incremental df maintenance: overwrite the changed partitions'
    * term-df rows (derived from the refresh's already-cached postings
    * frame), or — on a tokRoot whose df table predates this feature —
    * backfill it whole from the NOW-CURRENT postings table. The
    * backfill must come after the postings overwrite and re-derive
    * everything: overwriting only the changed partitions into an empty
    * table would silently miss the untouched ones. */
  private def maintainDf(
      spark: SparkSession, tokRoot: String, partitionBy: Seq[String],
      pf: DataFrame, changed: Set[String]): Unit = {
    val root = dfRoot(tokRoot)
    if (SnapshotTable.versions(spark, root).isEmpty)
      SnapshotTable.overwritePartitions(spark, root,
        dfFrame(postings(spark, tokRoot), partitionBy), partitionBy,
        statsFor = Seq("tok"), clusterBy = Seq("tok"))
    else
      SnapshotTable.overwritePartitions(spark, root,
        dfFrame(pf, partitionBy), partitionBy, dropKeys = changed)
  }

  /** The postings table `(…, doc_id, dl, tok, tf)` at its latest
    * version — the one-scan shape for corpus-wide work. */
  def postings(spark: SparkSession, tokRoot: String): DataFrame =
    SnapshotTable.read(spark, postingsRoot(tokRoot))

  /** Postings rows for a FEW terms, served through the manifest's
    * per-file tok stats in ONE read: the keep-set is the union of each
    * term's stat-matching files, so the plan pays one file index and
    * one scan — the probe shape. */
  def postingsForTerms(
      spark: SparkSession, tokRoot: String,
      terms: Seq[String]): DataFrame =
    SnapshotTable.readIn(
      spark, postingsRoot(tokRoot), "tok", terms.distinct)

  /** Corpus totals `(n_docs, total_dl)` from the per-partition stats
    * table — O(|partitions|) rows aggregated, never a document scan. */
  def corpusStats(spark: SparkSession, tokRoot: String): DataFrame =
    SnapshotTable.read(spark, statsRoot(tokRoot))
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("total_dl")).cast("long").as("total_dl"))

  /** Corpus document frequency `(tok, df)` for a FEW terms: a term-
    * pruned read of the vocabulary-sized df table, summed across
    * partitions — so a BM25 query's df stats no longer re-aggregate
    * the workload's postings, and the postings read itself keeps ONE
    * consumer (no cache barrier, one codegen pipeline end-to-end). A
    * pre-df tokRoot (never refreshed since the table landed) falls
    * back to the old inline aggregation — correct, just the old
    * two-pass cost. */
  def dfForTerms(
      spark: SparkSession, tokRoot: String, terms: Seq[String]): DataFrame =
    if (SnapshotTable.versions(spark, dfRoot(tokRoot)).isEmpty)
      postingsForTerms(spark, tokRoot, terms)
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    else
      SnapshotTable.readIn(spark, dfRoot(tokRoot), "tok", terms.distinct)
        .groupBy(col("tok")).agg(sum(col("df")).as("df"))

  /** Retention for both derived tables: refresh reads only their
    * latest versions, so history serves time travel alone. The BASE
    * corpus vacuum is the caller's (protect [[appliedBaseVersion]]
    * there). */
  def vacuum(
      spark: SparkSession, tokRoot: String,
      keepVersions: Int): (Int, Int) = {
    val (d1, f1) =
      SnapshotTable.vacuum(spark, postingsRoot(tokRoot), keepVersions)
    val (d2, f2) =
      SnapshotTable.vacuum(spark, statsRoot(tokRoot), keepVersions)
    val (d3, f3) =
      SnapshotTable.vacuum(spark, dfRoot(tokRoot), keepVersions)
    (d1 + d2 + d3, f1 + f2 + f3)
  }
}
