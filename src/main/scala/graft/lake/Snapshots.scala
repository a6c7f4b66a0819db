package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshots over plain parquet — the reproducibility
  * contract a training pipeline needs ("model X trained on corpus
  * snapshot v12") without adopting a table format.
  *
  * Layout:
  *  - `<root>/data/b<batch>-<uuid>/` — immutable parquet file sets; a
  *    writer NEVER mutates an existing data directory;
  *  - `<root>/_versions/v%08d.manifest` — one line per live data
  *    directory. THE MANIFEST IS THE COMMIT: it is written to a temp
  *    name and renamed into place (atomic on any POSIX-ish store), so
  *    readers either see a version completely or not at all. Data
  *    directories written by a crashed commit are invisible garbage
  *    (no manifest references them) until [[vacuum]] collects them.
  *
  * Semantics:
  *  - [[append]] — new version = previous file set + the new
  *    directory; no data is rewritten (the cheap, usual path);
  *  - [[overwrite]] — new version = exactly the new directory
  *    (compaction, re-curation, upsert results);
  *  - [[read]] — union of a version's directories; `version = -1`
  *    reads the latest. Old versions stay readable until vacuumed, so
  *    "train on v12" is reproducible while the corpus moves on.
  *
  * At 100 TB this is manifest-sized metadata over immutable data — the
  * same shape Delta/Iceberg commit logs use. Commits retry
  * optimistically: concurrent APPENDS both land (an append only adds
  * a directory, so re-deriving against the new latest is always a
  * valid merge) and overwrites are last-replace-wins on the next
  * version number — the flat-layer subset of [[SnapshotTable]]'s OCC
  * (no partition-level conflicts exist here to detect). The commit
  * publish is create-exclusive on every filesystem
  * ([[publishExclusive]]), local FS included.
  */
object Snapshots {
  /** A manifest rename lost the race for its version number —
    * retryable against the new latest. */
  private final class CommitRaceException(msg: String)
    extends java.io.IOException(msg)

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_versions")

  /** Fully qualified, slash-normalized rendering of a root path —
    * `makeQualified` resolves relative paths and adds the scheme, and
    * `Path` normalization strips trailing slashes, so two spellings of
    * the same directory ("corpus/", "file:/x/corpus", "./corpus")
    * compare equal. [[boundVersions]] MUST compare through this: a raw
    * string prefix match would silently fail to protect a pinned
    * version whenever the binding and the vacuum call spell the root
    * differently, and vacuum would collect a version the session is
    * actively reading. */
  private def qualifiedRoot(spark: SparkSession, root: String): String =
    fs(spark, root).makeQualified(new Path(root)).toString

  /** Publish `tmp` as `fin` with CREATE-EXCLUSIVE semantics; returns
    * false when another committer won the race (tmp is cleaned up
    * either way). On HDFS/object stores, `rename` already refuses an
    * existing destination — the historical protocol. On the local
    * filesystem Hadoop's rename OVERWRITES, so exists-check-then-rename
    * left a window where two racers both pass the check and one
    * silently replaces the other's just-committed manifest; there we
    * publish via POSIX link(2) instead ([[java.nio.file.Files#createLink]]),
    * which is atomic and fails with EEXIST — no window at all. */
  private[lake] def publishExclusive(
      f: org.apache.hadoop.fs.FileSystem, tmp: Path, fin: Path): Boolean = {
    val won =
      if (f.exists(fin)) false
      else if (Option(f.getUri.getScheme).contains("file")) {
        val lt = java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath)
        val lf = java.nio.file.Paths.get(f.makeQualified(fin).toUri.getPath)
        try { java.nio.file.Files.createLink(lf, lt); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          // filesystems without hard links (rare for scheme "file"):
          // fall back to the rename protocol and its documented window
          case _: UnsupportedOperationException => f.rename(tmp, fin)
        }
      } else f.rename(tmp, fin)
    // on link-success tmp is a second name for fin; on loss it is
    // garbage; on rename-success it is already gone (delete no-ops)
    f.delete(tmp, false)
    won
  }

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

  private def readManifest(
      spark: SparkSession, root: String, v: Int): Seq[String] = {
    val p = new Path(manifestDir(root), f"v$v%08d.manifest")
    val in = fs(spark, root).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  private def writeData(
      spark: SparkSession, root: String, df: DataFrame): String = {
    val dir = s"b${System.nanoTime()}-${java.util.UUID.randomUUID()}"
    df.write.parquet(new Path(root, s"data/$dir").toString)
    s"data/$dir"
  }

  /** Attempt to commit `dirs` as exactly version `v` — the version is
    * the CALLER's expectation, pinned at the moment it read the
    * previous manifest (computing it here would let a commit that
    * landed in between be silently dropped from an append's carried
    * file set). A lost race throws; [[append]]/[[overwrite]] retry
    * against the new latest. */
  private def commitAt(
      spark: SparkSession, root: String, dirs: Seq[String], v: Int): Int = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    // per-writer-unique tmp name: a SHARED tmp path would let a racing
    // writer's create(overwrite=true) truncate the file this writer is
    // about to rename, breaking the "never corrupt" half of
    // last-writer-wins
    val tmp = new Path(manifestDir(root),
      f".v$v%08d.${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write((dirs.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val fin = new Path(manifestDir(root), f"v$v%08d.manifest")
    // create-exclusive publish ([[publishExclusive]]): atomic
    // no-overwrite on HDFS/object stores via rename AND on local FS via
    // link(2), so a lost race always throws — it can never silently
    // replace a just-committed manifest of the same version.
    if (!publishExclusive(f, tmp, fin))
      throw new CommitRaceException(s"snapshot commit lost the race: $fin")
    v
  }

  /** Commit with optimistic retry: each attempt reads the latest
    * version, derives this commit's file set from it via `dirsFor`,
    * and targets exactly latest+1. Appends are conflict-free by
    * construction (they only ADD a directory, so re-deriving against
    * the new latest is always a valid merge — both racers land,
    * serialized); overwrites are replace semantics (last-replace-wins
    * on the next version number). Bounded so a pathological commit
    * storm surfaces instead of spinning. */
  /** Test seam: invoked between a commit attempt's manifest read and
    * its rename — a spec injects a competing committer here (the
    * [[SnapshotTable.onBeforeCommit]] pattern). */
  private[lake] var onBeforeCommit: () => Unit = () => ()

  private def commitRetrying(
      spark: SparkSession, root: String)(
      dirsFor: Seq[String] => Seq[String]): Int = {
    var attempts = 0
    while (true) {
      val latest = versions(spark, root).lastOption
      val prev = latest.map(readManifest(spark, root, _)).getOrElse(Nil)
      onBeforeCommit()
      try return commitAt(spark, root, dirsFor(prev),
        latest.getOrElse(0) + 1)
      catch {
        case e: CommitRaceException =>
          attempts += 1
          if (attempts > 8) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** New version = previous file set + `df`'s files. Returns it.
    * Concurrent appends both land (optimistic retry — an append can
    * never conflict, it only adds a directory). */
  def append(spark: SparkSession, root: String, df: DataFrame): Int = {
    val dir = writeData(spark, root, df)
    commitRetrying(spark, root)(prev => prev :+ dir)
  }

  /** New version = exactly `df`'s files (replace semantics;
    * last-replace-wins under concurrency, never corrupt). */
  def overwrite(spark: SparkSession, root: String, df: DataFrame): Int = {
    val dir = writeData(spark, root, df)
    commitRetrying(spark, root)(_ => Seq(dir))
  }

  /** Read a version (latest when `version < 0`). */
  def read(spark: SparkSession, root: String, version: Int = -1): DataFrame =
    spark.read.parquet(dirsFor(spark, root, version): _*)

  /** A version's absolute data-directory paths — the scan inputs the
    * DSv2 SQL surface ([[LakeCatalog]]) feeds to Spark's parquet
    * source (this flat layer records no schema; the catalog table
    * infers from footers like [[read]] does). */
  def dirsFor(
      spark: SparkSession, root: String, version: Int = -1): Seq[String] = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no snapshot committed under $root")
    val v = if (version < 0) vs.last else version
    require(vs.contains(v), s"unknown snapshot v$v (have ${vs.mkString(",")})")
    readManifest(spark, root, v).map(d => new Path(root, d).toString)
  }

  /** Version numbers of `root` that the session's snapshot bindings
    * (`spark.graft.snapshot.<table> = <root>@v<N>`) currently pin —
    * the versions a vacuum of this root must not collect, or every
    * lane query reading through [[graft.core.Tables]] under that
    * binding starts failing. `@latest` bindings resolve per lookup and
    * are protected by the keep horizon itself (keepVersions >= 1). */
  def boundVersions(spark: SparkSession, root: String): Set[Int] = {
    // compare QUALIFIED roots, not raw strings: a binding that spells
    // the root with a trailing slash, a file: scheme, or a relative
    // path must still protect its pinned version (ADVICE r10 item 1)
    val wanted = qualifiedRoot(spark, root)
    spark.conf.getAll.collect {
      case (k, v) if k.startsWith("spark.graft.snapshot.") &&
          v.lastIndexOf("@v") > 0 =>
        val at = v.lastIndexOf("@v")
        val bound = scala.util.Try(qualifiedRoot(spark, v.substring(0, at)))
          .getOrElse(v.substring(0, at))
        if (bound == wanted)
          scala.util.Try(v.substring(at + 2).toInt).toOption
        else None
    }.flatten.toSet
  }

  /** Drop all but the newest `keepVersions` manifests — except versions
    * in `protect` and versions the CURRENT session's snapshot bindings
    * pin ([[boundVersions]] — the binding contract: "train on v12"
    * keeps v12 readable through a routine vacuum); for bindings held by
    * OTHER sessions, pass their versions in `protect` explicitly — and
    * delete every data directory no kept manifest references, including
    * directories orphaned by crashed commits. Returns (manifests
    * dropped, data dirs deleted). */
  def vacuum(
      spark: SparkSession, root: String, keepVersions: Int,
      protect: Set[Int] = Set.empty): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val f = fs(spark, root)
    val vs = versions(spark, root)
    val keepSet = protect ++ boundVersions(spark, root)
    val drop = vs.dropRight(keepVersions).filterNot(keepSet)
    val keep = vs.filterNot(drop.contains)
    val live = keep.flatMap(readManifest(spark, root, _)).toSet
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
    // tmp manifests from crashed commits (".vNNNNNNNN.<uuid>.tmp") are
    // the metadata analog of orphaned data dirs — collect them too.
    // Safe because the commit contract is single-writer: vacuum must
    // not run concurrently with a committer anyway. Guarded: on a root
    // where no snapshot was ever committed (_versions missing),
    // listStatus would throw FileNotFoundException instead of the
    // (0, 0) no-op every other branch of vacuum returns.
    if (f.exists(manifestDir(root)))
      f.listStatus(manifestDir(root)).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(".") && n.endsWith(".tmp")) f.delete(st.getPath, false)
      }
    (drop.size, removed)
  }
}
