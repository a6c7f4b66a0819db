package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental manifest log (round-11 verdict item 1): a commit
  * writes a DELTA — its own partition entries, its own files' stats and
  * byte-census lines, tombstones for partitions it emptied — never the
  * untouched remainder of the table; every
  * [[SnapshotTable.CheckpointEvery]]-th commit folds the chain into a
  * full sidecar so read cost stays bounded. These specs pin the cost
  * claims directly (the GenerationsSpec pattern): total manifest bytes
  * across n single-partition commits must grow like o(n²), where the
  * old full-rewrite design was Θ(n · table). */
class ManifestLogSpec extends SparkSpec {
  import spark.implicits._

  private def versionsDirFiles(root: String): Seq[(String, Long)] = {
    val d = new java.io.File(root, "_versions")
    d.listFiles().toSeq.filterNot(_.getName.startsWith("."))
      .map(f => (f.getName, f.length()))
  }

  test("n single-partition commits write o(n^2) manifest bytes") {
    val root = tmpDir("mlog-bytes")
    val nParts = 40
    val base = spark.range(4000L).select(
      concat(lit("p"), (col("id") % nParts).cast("string")).as("p"),
      col("id").as("k"), (col("id") * 3).as("v"))
    SnapshotTable.write(spark, root, base, Seq("p"),
      filesPerPartition = 2, statsFor = Seq("k"), clusterBy = Seq("k"))

    val nCommits = 24
    (1 to nCommits).foreach { i =>
      val part = s"p${i % nParts}"
      val ups = spark.range(5L).select(
        lit(part).as("p"), (col("id") + 100000L * i).as("k"),
        lit(-1L).as("v"))
      SnapshotTable.upsert(spark, root, ups, "k", Seq("p"),
        filesPerPartition = 2)
    }

    val files = versionsDirFiles(root)
    val deltas = files.filter { case (n, _) =>
      n.endsWith(".manifest") && n != "v00000001.manifest" }
    val checkpoints = files.filter(_._1.endsWith(".checkpoint"))
    val fullSize = files.collectFirst {
      case (n, sz) if n == "v00000001.manifest" => sz }.get

    // (a) the old design's counterfactual: every commit rewrites at
    // least a full-table manifest (it only ever GROWS as stats lines
    // accrue). The log must beat half of even that lower bound.
    val counterfactual = nCommits * fullSize
    val actual = files.map(_._2).sum
    assert(actual < counterfactual / 2,
      s"manifest log wrote $actual bytes; full-rewrite lower bound " +
        s"was $counterfactual")

    // (b) delta files are O(commit), not O(table): every delta must be
    // far below the full-state size (each touches 1 of 40 partitions).
    val maxDelta = deltas.map(_._2).max
    assert(maxDelta < fullSize / 4,
      s"largest delta is $maxDelta bytes vs full state $fullSize — " +
        "a delta is carrying table-sized payload")

    // (c) checkpoints exist on the CheckpointEvery cadence and bound
    // the fold; they are the ONLY O(table) files in the log.
    assert(checkpoints.nonEmpty, "no checkpoint written in 24 commits")
    checkpoints.foreach { case (n, _) =>
      val v = n.stripPrefix("v").stripSuffix(".checkpoint").toInt
      assert(v % SnapshotTable.CheckpointEvery == 0,
        s"checkpoint $n off the cadence") }

    // (d) the folded state is still exactly right at the head and under
    // time travel across checkpoint boundaries.
    val head = SnapshotTable.read(spark, root)
    assert(head.count() == 4000L + 5L * nCommits)
    assert(head.filter(col("v") === -1L).count() == 5L * nCommits)
    val mid = SnapshotTable.read(spark, root,
      SnapshotTable.CheckpointEvery + 1)
    assert(mid.count() ==
      4000L + 5L * SnapshotTable.CheckpointEvery)
  }

  test("a delta file mentions only its own commit's partitions") {
    val root = tmpDir("mlog-delta")
    val base = spark.range(300L).select(
      concat(lit("p"), (col("id") % 30).cast("string")).as("p"),
      col("id").as("k"), col("id").as("v"))
    SnapshotTable.write(spark, root, base, Seq("p"), statsFor = Seq("k"))
    val ups = Seq(("p7", 1000L, 0L), ("p7", 1001L, 0L), ("p9", 1002L, 0L))
      .toDF("p", "k", "v")
    val v = SnapshotTable.upsert(spark, root, ups, "k", Seq("p"))
    val src = scala.io.Source.fromFile(root + f"/_versions/v$v%08d.manifest")
    val lines = try src.getLines().toList finally src.close()
    val entryKeys = lines.filterNot(_.startsWith("#"))
      .map(_.split('\t')(0)).toSet
    assert(entryKeys == Set("p7", "p9"),
      s"delta carries entries for $entryKeys")
    assert(lines.exists(_.startsWith("#delta\t")), "no #delta base line")
    // stats lines too: only the rewritten partitions' own directories
    // (the ones this delta's entries map to)
    val ownDirs = lines.filterNot(_.startsWith("#"))
      .map(_.split('\t')(1)).toSet
    val statDirs = lines.filter(_.startsWith("#f\t"))
      .map(_.split('\t')(1)).map(r => r.take(r.lastIndexOf('/'))).toSet
    assert(statDirs.subsetOf(ownDirs),
      s"delta carries stats for untouched dirs: ${statDirs -- ownDirs}")
  }

  test("emptied partitions tombstone in the delta and fold away") {
    val root = tmpDir("mlog-rm")
    val base = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 3L))
      .toDF("p", "k", "v")
    SnapshotTable.write(spark, root, base, Seq("p"), statsFor = Seq("k"))
    // delete every row of partition a -> its key must tombstone
    val v = SnapshotTable.deleteWhere(spark, root, col("p") === "a", Seq("p"))
    val src = scala.io.Source.fromFile(root + f"/_versions/v$v%08d.manifest")
    val lines = try src.getLines().toList finally src.close()
    assert(lines.exists(_.startsWith("#rm\ta")),
      s"no tombstone for the emptied partition: $lines")
    val after = SnapshotTable.read(spark, root)
    assert(after.select("k").as[Long].collect().toSet == Set(3L))
    // and the pre-delete version still folds to the full table
    assert(SnapshotTable.read(spark, root, 1).count() == 3)
  }

  test("vacuum keeps kept versions readable when their chain is dropped") {
    val root = tmpDir("mlog-vacuum")
    val base = Seq(("a", 1L, 10L)).toDF("p", "k", "v")
    SnapshotTable.write(spark, root, base, Seq("p"))
    (2 to 6).foreach { i =>
      SnapshotTable.upsert(spark, root,
        Seq(("a", i.toLong, i * 10L)).toDF("p", "k", "v"), "k", Seq("p"))
    }
    // v2..v6 are deltas on the v1 full manifest; no checkpoint yet
    // (CheckpointEvery = 8). Dropping v1-v4 severs v5/v6's chains.
    val (dropped, _) = SnapshotTable.vacuum(spark, root, keepVersions = 2)
    assert(dropped == 4)
    assert(SnapshotTable.versions(spark, root) == Seq(5, 6))
    assert(SnapshotTable.read(spark, root, 5).count() == 5)
    assert(SnapshotTable.read(spark, root, 6).count() == 6)
  }

  test("latest resolves through the hint pointer; stale/corrupt/missing degrade") {
    val root = tmpDir("mlog-hint")
    val base = Seq(("a", 1L, 1L)).toDF("p", "k", "v")
    SnapshotTable.write(spark, root, base, Seq("p"))
    (2L to 5L).foreach { i =>
      SnapshotTable.upsert(spark, root,
        Seq(("a", i, i)).toDF("p", "k", "v"), "k", Seq("p"))
    }
    val hint = new java.io.File(root, "_versions/_latest.hint")
    assert(hint.exists, "commit did not publish the latest-version hint")
    assert(scala.io.Source.fromFile(hint).mkString.trim == "5")
    def latestCount(): Long = SnapshotTable.read(spark, root).count()
    assert(latestCount() == 5)
    // STALE hint (a lagging writer): forward probe must still find v5
    java.nio.file.Files.write(hint.toPath, "2".getBytes("UTF-8"))
    assert(latestCount() == 5)
    // CORRUPT hint: listing fallback
    java.nio.file.Files.write(hint.toPath, "garbage".getBytes("UTF-8"))
    assert(latestCount() == 5)
    // MISSING hint: listing fallback
    assert(hint.delete())
    assert(latestCount() == 5)
    // and the next commit republishes it
    SnapshotTable.upsert(spark, root,
      Seq(("a", 6L, 6L)).toDF("p", "k", "v"), "k", Seq("p"))
    assert(scala.io.Source.fromFile(hint).mkString.trim == "6")
  }

  test("NaN/Infinity stat renderings never skip and never throw") {
    val root = tmpDir("mlog-nan")
    // three files by construction: finite-low, NaN-containing, finite-hi
    val df = spark.range(300L).select(
      when(col("id") < 100, "lo").when(col("id") < 200, "poison")
        .otherwise("hi").as("p"),
      when(col("id") >= 100 && col("id") < 200 && col("id") % 7 === 0,
        lit(Double.NaN))
        .otherwise(col("id").cast("double")).as("x"),
      col("id").as("payload"))
    SnapshotTable.write(spark, root, df, Seq("p"), statsFor = Seq("x"))
    // Spark's max treats NaN as greatest: the poison file's recorded
    // max renders "NaN". The band read must keep that file (its finite
    // rows can match) instead of throwing in BigDecimal parse.
    val band = SnapshotTable.readBetween(spark, root, "x", 150.0, 160.0)
    assert(band.count() == df
      .filter(col("x") >= 150.0 && col("x") <= 160.0).count())
    // and pruning still works where stats are finite
    val lowBand = SnapshotTable.readBetween(spark, root, "x", 0.0, 50.0)
    assert(lowBand.count() == 51)
    assert(lowBand.inputFiles.length <
      SnapshotTable.read(spark, root).inputFiles.length,
      "finite files should still prune")
  }

  test("special-character partition values keep stats usable") {
    val root = tmpDir("mlog-special")
    // '%', '=', '#', ' ' in the value: Hive-escaping of the directory
    // name must round-trip into the census relPaths (ADVICE r11 item 5)
    val df = Seq(
      ("100%=a#b c", 1L, 1L), ("100%=a#b c", 2L, 2L),
      ("plain", 3L, 3L), ("plain", 4L, 4L))
      .toDF("p", "k", "v")
    SnapshotTable.write(spark, root, df, Seq("p"), statsFor = Seq("k"))
    val all = SnapshotTable.read(spark, root)
    assert(all.count() == 4)
    // the pruned read must NOT silently fall back to listing (which
    // would mask a census/dir mismatch) — it must open exactly the
    // stat-matching file and return the right rows
    val band = SnapshotTable.readBetween(spark, root, "k", 1L, 2L)
    assert(band.count() == 2)
    assert(band.inputFiles.length == 1,
      s"expected exactly the special partition's file, got " +
        s"${band.inputFiles.mkString(",")}")
    assert(band.select("p").distinct().as[String].collect().toSeq ==
      Seq("100%=a#b c"))
  }
}
