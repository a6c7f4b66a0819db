package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot versioning: every committed version stays byte-reproducible
  * while the corpus moves on; crashed commits are invisible; vacuum
  * collects exactly the unreferenced data. */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def ids(root: String, v: Int = -1): Set[Long] =
    Snapshots.read(spark, root, v).select(col("id"))
      .as[Long].collect().toSet

  test("append and overwrite versions are each exactly reproducible") {
    val root = tmpDir("snap")
    val v1 = Snapshots.append(spark, root, spark.range(0, 10).toDF())
    val v2 = Snapshots.append(spark, root, spark.range(10, 15).toDF())
    val v3 = Snapshots.overwrite(spark, root, spark.range(100, 103).toDF())
    assert(Seq(v1, v2, v3) == Seq(1, 2, 3))
    assert(ids(root, 1) == (0L until 10L).toSet)
    assert(ids(root, 2) == (0L until 15L).toSet,
      "append must layer on the previous version's files")
    assert(ids(root, 3) == (100L until 103L).toSet,
      "overwrite must replace the file set")
    assert(ids(root) == ids(root, 3), "latest == newest version")
    // v1 is STILL v1 after later commits — the reproducibility contract
    assert(ids(root, 1) == (0L until 10L).toSet)
  }

  test("OCC: racing appends BOTH land; racing overwrite is last-replace-wins") {
    // Appends can never conflict — they only ADD a directory — so a
    // commit race resolves by re-deriving against the new latest: B
    // commits v2 inside A's commit window (the onBeforeCommit seam),
    // and A lands v3 carrying BOTH directories. No lost update.
    val root = tmpDir("snap-occ")
    Snapshots.append(spark, root, spark.range(0, 10).toDF()) // v1
    @volatile var fired = false
    Snapshots.onBeforeCommit = () => {
      if (!fired) {
        fired = true
        Snapshots.append(spark, root, spark.range(100, 105).toDF()) // B: v2
      }
    }
    try {
      val vA = Snapshots.append(spark, root, spark.range(200, 203).toDF())
      assert(vA == 3, s"A should land AFTER B's v2, got v$vA")
    } finally Snapshots.onBeforeCommit = () => ()
    assert(ids(root, 3) == ((0L until 10L) ++ (100L until 105L) ++
      (200L until 203L)).toSet,
      "the retried append must carry the interloper's directory forward")
    assert(ids(root, 2) == ((0L until 10L) ++ (100L until 105L)).toSet)
    // a racing overwrite retries onto the next number: replace wins
    fired = false
    Snapshots.onBeforeCommit = () => {
      if (!fired) {
        fired = true
        Snapshots.append(spark, root, spark.range(300, 302).toDF()) // v4
      }
    }
    try {
      val vO = Snapshots.overwrite(spark, root, spark.range(900, 902).toDF())
      assert(vO == 5, s"overwrite should retry onto v5, got v$vO")
    } finally Snapshots.onBeforeCommit = () => ()
    assert(ids(root, 5) == (900L until 902L).toSet)
  }

  test("a crashed commit (data without manifest) is invisible to readers") {
    val root = tmpDir("snap-crash")
    Snapshots.append(spark, root, spark.range(0, 5).toDF())
    // simulate a writer that died after writing data, before the
    // manifest rename: bare data directory, no manifest references it
    spark.range(50, 60).toDF().write
      .parquet(s"$root/data/b0-orphan")
    assert(ids(root) == (0L until 5L).toSet,
      "an uncommitted data directory leaked into a read")
    // the next commit is unaffected and numbers continue
    val v = Snapshots.append(spark, root, spark.range(5, 7).toDF())
    assert(v == 2 && ids(root) == (0L until 7L).toSet)
    // vacuum collects the orphan
    val (dropped, removed) = Snapshots.vacuum(spark, root, keepVersions = 2)
    assert(dropped == 0 && removed == 1,
      s"vacuum should collect exactly the orphan, got ($dropped, $removed)")
    assert(ids(root) == (0L until 7L).toSet)
  }

  test("vacuum collects tmp manifests left by crashed commits") {
    val root = tmpDir("snap-tmp")
    Snapshots.overwrite(spark, root, spark.range(0, 3).toDF())
    // simulate a writer that died between create(tmp) and rename
    val orphan = new java.io.File(s"$root/_versions/.v00000002.dead.tmp")
    java.nio.file.Files.writeString(orphan.toPath, "data/never-landed\n")
    Snapshots.vacuum(spark, root, keepVersions = 1)
    assert(!orphan.exists(), "crashed-commit tmp manifest not collected")
    assert(ids(root, 1) == (0L until 3L).toSet)
  }

  test("vacuum of a never-committed root is a (0, 0) no-op") {
    // _versions does not exist yet — the tmp-manifest sweep used to
    // listStatus it unconditionally and throw FileNotFoundException,
    // unlike versions() which guards with exists() (round-8 advice).
    val root = tmpDir("snap-empty")
    assert(Snapshots.vacuum(spark, root, keepVersions = 1) == (0, 0))
  }

  test("vacuum keeps the newest versions readable, drops the rest") {
    val root = tmpDir("snap-vac")
    Snapshots.overwrite(spark, root, spark.range(0, 3).toDF())
    Snapshots.overwrite(spark, root, spark.range(3, 6).toDF())
    Snapshots.overwrite(spark, root, spark.range(6, 9).toDF())
    val (dropped, removed) = Snapshots.vacuum(spark, root, keepVersions = 1)
    assert(dropped == 2 && removed == 2)
    assert(Snapshots.versions(spark, root) == Seq(3))
    assert(ids(root, 3) == (6L until 9L).toSet)
    intercept[IllegalArgumentException] { ids(root, 1) }
  }
}
