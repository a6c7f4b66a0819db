package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned table with MULTI-PARTITION ATOMIC upsert/delete —
  * [[Lake.upsert]]'s merge semantics composed with [[Snapshots]]'
  * manifest-commit machinery (round-8 verdict item 3).
  *
  * [[Lake.upsert]] is honest that its atomicity unit is the partition
  * DIRECTORY: a crashed multi-partition batch is recoverable (every
  * partition is old, new, or restorable), but not atomic — a reader can
  * observe some partitions updated and others not. This table closes
  * that gap the way Delta/Iceberg do, with machinery already in the
  * repo: data directories are IMMUTABLE (one directory per partition
  * value per rewrite, never mutated), and a version = one manifest
  * mapping partition value -> live directory, renamed into place
  * atomically. A batch that touches 50 partitions writes 50 new
  * directories and then commits ONE manifest: readers see all 50 or
  * none. A crash before the commit leaves invisible garbage directories
  * ([[vacuum]] collects them) — never a half-applied batch.
  *
  * Layout:
  *  - `<root>/data/p<nano>-<n>-<uuid>/` — one partition value's rows,
  *    full schema INCLUDING the partition column (directories are
  *    manifest-addressed, not Hive-path-addressed, so the column lives
  *    in the files and reads need no partition-path reconstruction);
  *  - `<root>/_versions/v%08d.manifest` — lines `key<TAB>dir`, where
  *    `key` is Spark's OWN Hive-escaped rendering of the partition
  *    value (the exact string `partitionBy(...)` writes after `=`, so
  *    every value Spark can write is round-trippable, including nulls
  *    as `__HIVE_DEFAULT_PARTITION__` and values needing escaping).
  *
  * Scale shape: an upsert reads and rewrites ONLY the touched
  * partitions' directories (manifest-pruned — untouched directories are
  * not even listed), the rewrite job salts across
  * `filesPerPartition` writer tasks per partition ([[Lake]]'s hot-
  * partition fan-out), and the commit is manifest-sized metadata.
  * Old versions stay readable until vacuumed ([[Snapshots]]' time-travel
  * contract), so "train on v12" composes with CDC-maintained tables.
  * Deliberately NOT here, same as [[Snapshots]]: multi-writer
  * coordination — one writer at a time, rename makes racing commits
  * last-writer-wins, never corrupt.
  */
object SnapshotTable {
  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_versions")

  /** Committed version numbers, ascending (empty if none). */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toInt)
      .sorted.toSeq
  }

  /** (partition key, data dir) entries of a version's manifest. Keys
    * are Hive-escaped (no tab/newline can appear), so TAB is a safe
    * separator. */
  private def readManifest(
      spark: SparkSession, root: String, v: Int): Seq[(String, String)] = {
    val p = new Path(manifestDir(root), f"v$v%08d.manifest")
    val in = fs(spark, root).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).map { line =>
        val i = line.indexOf('\t')
        (line.substring(0, i), line.substring(i + 1))
      }.toList
    finally in.close()
  }

  /** THE COMMIT: write the manifest to a writer-unique tmp name, rename
    * into place — same protocol and race posture as
    * [[Snapshots.commit]]. */
  private def commitManifest(
      spark: SparkSession, root: String,
      entries: Seq[(String, String)]): Int = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    val v = versions(spark, root).lastOption.getOrElse(0) + 1
    val tmp = new Path(manifestDir(root),
      f".v$v%08d.${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(entries.map { case (k, d) => s"$k\t$d" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val fin = new Path(manifestDir(root), f"v$v%08d.manifest")
    if (f.exists(fin) || !f.rename(tmp, fin)) {
      f.delete(tmp, false)
      throw new java.io.IOException(s"snapshot commit lost the race: $fin")
    }
    v
  }

  private def entriesAt(
      spark: SparkSession, root: String, version: Int): Seq[(String, String)] = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no snapshot-table version committed under $root")
    val v = if (version < 0) vs.last else version
    require(vs.contains(v), s"unknown version v$v (have ${vs.mkString(",")})")
    readManifest(spark, root, v)
  }

  /** Read a version (latest when `version < 0`). */
  def read(spark: SparkSession, root: String, version: Int = -1): DataFrame = {
    val dirs = entriesAt(spark, root, version)
      .map(e => new Path(root, e._2).toString)
    require(dirs.nonEmpty, "version has an empty manifest")
    spark.read.parquet(dirs: _*)
  }

  /** Manifest-pruned read of selected partitions: `keys` are the
    * Spark-rendered partition values (cast-to-string; null selects the
    * null partition). Directories of other partitions are not listed,
    * let alone opened. */
  def readPartitions(
      spark: SparkSession, root: String, keys: Seq[String],
      version: Int = -1): DataFrame = {
    val wanted = keys.map(escapeKey).toSet
    val dirs = entriesAt(spark, root, version)
      .collect { case (k, d) if wanted(k) => new Path(root, d).toString }
    if (dirs.isEmpty)
      // empty frame with the table's schema (read one dir for schema)
      read(spark, root, version).limit(0)
    else spark.read.parquet(dirs: _*)
  }

  private def escapeKey(rendered: String): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    if (rendered == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    else ExternalCatalogUtils.escapePathName(rendered)
  }

  /** Initial (or full-replace) commit: new version = exactly `df`,
    * one immutable directory per partition value. */
  def write(
      spark: SparkSession, root: String, df: DataFrame, partitionBy: String,
      filesPerPartition: Int = 1): Int =
    commitRewrite(spark, root, df, partitionBy, untouched = Nil,
      filesPerPartition, crashBeforeCommit = false)

  /** Upsert `updates` (same contract as [[Lake.upsert]]: full schema,
    * unique non-null keys, stable partition per key): rows whose `key`
    * exists are replaced, new keys inserted. Only partitions present in
    * the batch are read or rewritten, and the whole batch becomes
    * visible in ONE manifest commit. Returns the new version.
    *
    * `crashBeforeCommit` is the test seam for the atomicity claim: it
    * aborts after every data directory is fully written, before the
    * manifest rename — readers must still see the previous version
    * exactly. */
  def upsert(
      spark: SparkSession, root: String, updates: DataFrame, key: String,
      partitionBy: String, filesPerPartition: Int = 1,
      crashBeforeCommit: Boolean = false): Int = {
    Lake.validateUpdateBatch(updates, key)
    // bootstrap: an upsert into a never-written table is the initial
    // commit (the CDC-stream shape — the first drained batch creates v1)
    val entries =
      if (versions(spark, root).isEmpty) Nil
      else entriesAt(spark, root, -1)
    val touched = Lake.touchedPartitions(updates, partitionBy)
    val touchedKeys = touched.map(t => escapeKey(t._2)).toSet
    val (liveTouched, untouched) =
      entries.partition(e => touchedKeys(e._1))
    // updates are always projected to the TABLE's column set (feed-only
    // columns, e.g. a CDC version, are dropped) — otherwise a pure-
    // insert batch would commit directories whose schema drifts from
    // the table's and later unioned reads would diverge by entry order
    val merged =
      if (entries.isEmpty) updates // bootstrap: updates define the schema
      else {
        val tableCols = spark.read
          .parquet(new Path(root, entries.head._2).toString).columns
        if (liveTouched.isEmpty) // all-new partitions: pure insert
          updates.select(tableCols.map(col).toSeq: _*)
        else {
          val live = spark.read.parquet(
            liveTouched.map(e => new Path(root, e._2).toString): _*)
          live
            .join(updates.select(col(key).as("_graft_k")),
              col(key) === col("_graft_k"), "left_anti")
            .unionByName(updates.select(live.columns.map(col).toSeq: _*))
        }
      }
    commitRewrite(spark, root, merged, partitionBy, untouched,
      filesPerPartition, crashBeforeCommit)
  }

  /** Delete rows matching `predicate`; NULL-predicate rows are kept
    * (same three-valued-logic contract as [[Lake.deleteWhere]]). A
    * partition losing all rows drops out of the manifest. Returns the
    * new version. */
  def deleteWhere(
      spark: SparkSession, root: String, predicate: Column,
      partitionBy: String, filesPerPartition: Int = 1): Int = {
    val entries = entriesAt(spark, root, -1)
    val all = read(spark, root)
    val touched = Lake.touchedPartitions(all.filter(predicate), partitionBy)
    val touchedKeys = touched.map(t => escapeKey(t._2)).toSet
    val (liveTouched, untouched) =
      entries.partition(e => touchedKeys(e._1))
    // nothing matched: the current version IS the result — an identical
    // re-commit would only mint garbage for vacuum
    if (liveTouched.isEmpty) return versions(spark, root).last
    val kept = spark.read.parquet(
        liveTouched.map(e => new Path(root, e._2).toString): _*)
      .filter(coalesce(!predicate, lit(true)))
    commitRewrite(spark, root, kept, partitionBy, untouched,
      filesPerPartition, crashBeforeCommit = false)
  }

  /** Write `newRows` as fresh immutable per-partition directories, then
    * commit `untouched ++ new` as one manifest. The staging write
    * duplicates the partition column into a throwaway directory key, so
    * the real column SURVIVES in the data files while Spark's own
    * partitioned write (with [[Lake]]'s salt for per-partition writer
    * fan-out) produces one cleanly separated directory per value with
    * Spark's own Hive escaping — the manifest key is read off the
    * directory name, byte-identical to what a Hive-layout writer would
    * have produced. */
  private def commitRewrite(
      spark: SparkSession, root: String, newRows: DataFrame,
      partitionBy: String, untouched: Seq[(String, String)],
      filesPerPartition: Int, crashBeforeCommit: Boolean): Int = {
    val f = fs(spark, root)
    val stagingName = s".staging-${java.util.UUID.randomUUID()}"
    val staging = new Path(root, stagingName)
    val stagingCol = Iterator.from(0).map {
      case 0 => "_graft_p"
      case i => s"_graft_p_$i"
    }.find(n => !newRows.columns.contains(n)).get
    Lake.repartitionForLayout(
        newRows.withColumn(stagingCol, col(partitionBy).cast("string")),
        Seq(partitionBy), filesPerPartition,
        spark.sessionState.conf.numShufflePartitions.min(64) *
          filesPerPartition.max(1))
      .write.mode("overwrite").partitionBy(stagingCol)
      .parquet(staging.toString)
    f.mkdirs(new Path(root, "data"))
    val prefix = s"$stagingCol="
    val moved = f.listStatus(staging)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .zipWithIndex.map { case (st, i) =>
        val k = st.getPath.getName.stripPrefix(prefix)
        val dir = s"data/p${System.nanoTime()}-$i-" +
          java.util.UUID.randomUUID()
        if (!f.rename(st.getPath, new Path(root, dir)))
          throw new java.io.IOException(
            s"cannot move staged partition ${st.getPath} into $dir")
        (k, dir)
      }.toSeq
    f.delete(staging, true)
    if (crashBeforeCommit)
      throw new java.io.IOException(
        "simulated crash after data write, before manifest commit")
    commitManifest(spark, root, untouched ++ moved)
  }

  /** Drop all but the newest `keepVersions` manifests; delete every data
    * directory no kept manifest references — including directories
    * written by crashed (never-committed) batches — and tmp manifests
    * from crashed commits. Returns (manifests dropped, data dirs
    * deleted). Single-writer contract: do not run concurrently with a
    * committer. */
  def vacuum(
      spark: SparkSession, root: String, keepVersions: Int): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val f = fs(spark, root)
    if (!f.exists(new Path(root))) return (0, 0) // never-written root
    val vs = versions(spark, root)
    val (drop, keep) = vs.splitAt((vs.size - keepVersions).max(0))
    val live = keep.flatMap(readManifest(spark, root, _)).map(_._2).toSet
    drop.foreach(v =>
      f.delete(new Path(manifestDir(root), f"v$v%08d.manifest"), false))
    val dataDir = new Path(root, "data")
    var removed = 0
    if (f.exists(dataDir)) f.listStatus(dataDir).foreach { st =>
      if (!live.contains(s"data/${st.getPath.getName}")) {
        f.delete(st.getPath, true)
        removed += 1
      }
    }
    if (f.exists(manifestDir(root)))
      f.listStatus(manifestDir(root)).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(".") && n.endsWith(".tmp")) f.delete(st.getPath, false)
      }
    // crashed-batch staging dirs are garbage too
    f.listStatus(new Path(root)).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith(".staging-"))
        f.delete(st.getPath, true)
    }
    (drop.size, removed)
  }
}
