package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SHALLOW CLONE (round-16 verdict item 7): zero-copy table branching
  * as ONE metadata commit referencing the source's immutable data
  * directories — clone reads ≡ source@v, diverging writes never cross,
  * and retention is safe in BOTH directions, proven destructively. */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshSource(): String = {
    n += 1
    val root = tmpDir(s"clone-src-$n")
    val rows = spark.range(40L).select(
      (col("id") % 4).cast("string").as("src"),
      col("id").as("k"), (col("id") * 7 % 23).as("v"))
    SnapshotTable.write(spark, root, rows, Seq("src"),
      statsFor = Seq("v"))
    root
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select($"src", $"k", $"v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("clone reads equal source@v via one metadata commit, zero copy") {
    val src = freshSource()
    SnapshotTable.upsert(spark, src,
      Seq(("0", 100L, 1L)).toDF("src", "k", "v"), "k", Seq("src"))
    val want = rowsOf(SnapshotTable.read(spark, src, 2))
    val tgt = tmpDir("clone-tgt") + "/t"
    SnapshotTable.shallowClone(spark, src, tgt)
    assert(rowsOf(SnapshotTable.read(spark, tgt)) == want)
    // zero data copy: the clone root holds NO data directory at all
    assert(!new java.io.File(tgt, "data").exists(),
      "shallow clone copied data")
    // the contract travels: stats-pruned reads serve through the
    // cloned per-file census (absolute references)
    assert(SnapshotTable.readBetween(spark, tgt, "v", 3L, 5L)
      .count() == want.count(r => r._3 >= 3 && r._3 <= 5))
    // VERSION AS OF pins the pre-upsert state
    val tgt1 = tmpDir("clone-tgt1") + "/t"
    SnapshotTable.shallowClone(spark, src, tgt1, version = 1)
    assert(rowsOf(SnapshotTable.read(spark, tgt1)) ==
      rowsOf(SnapshotTable.read(spark, src, 1)))
  }

  test("diverging writes never cross") {
    val src = freshSource()
    val tgt = tmpDir("clone-tgt") + "/t"
    SnapshotTable.shallowClone(spark, src, tgt)
    val srcBefore = rowsOf(SnapshotTable.read(spark, src))
    // clone writes: invisible to the source
    SnapshotTable.upsert(spark, tgt,
      Seq(("0", 500L, 9L)).toDF("src", "k", "v"), "k", Seq("src"))
    assert(rowsOf(SnapshotTable.read(spark, src)) == srcBefore)
    assert(SnapshotTable.read(spark, tgt)
      .filter($"k" === 500L).count() == 1)
    // the clone's new rows live under ITS root
    assert(new java.io.File(tgt, "data").exists())
    // source writes after the clone: invisible to the clone
    val cloneBefore = rowsOf(SnapshotTable.read(spark, tgt))
    SnapshotTable.upsert(spark, src,
      Seq(("1", 600L, 9L)).toDF("src", "k", "v"), "k", Seq("src"))
    assert(rowsOf(SnapshotTable.read(spark, tgt)) == cloneBefore)
  }

  test("source vacuum cannot garbage a clone's live files (destructive)") {
    val src = freshSource()
    val tgt = tmpDir("clone-tgt") + "/t"
    SnapshotTable.shallowClone(spark, src, tgt)
    val want = rowsOf(SnapshotTable.read(spark, tgt))
    // rewrite EVERY partition in the source so v1's directories are no
    // longer referenced by any SOURCE manifest a keep-1 vacuum retains
    (0 to 3).foreach { p =>
      SnapshotTable.upsert(spark, src,
        Seq((p.toString, 1000L + p, 1L)).toDF("src", "k", "v"),
        "k", Seq("src"))
    }
    val (_, deleted) = SnapshotTable.vacuum(spark, src, keepVersions = 1)
    // the refcount kept the clone's world: identical rows, proven
    // against bytes (not cache) by a fresh read
    assert(rowsOf(SnapshotTable.read(spark, tgt)) == want,
      "source vacuum garbaged a live clone's files")
    assert(deleted == 0,
      s"vacuum deleted $deleted dir(s) the clone still references")
    // destructive control: REMOVE the clone, vacuum again — now the
    // same directories ARE garbage and must go (the refcount is a
    // refcount, not a leak)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(tgt).getParentFile)
    val (_, deleted2) = SnapshotTable.vacuum(spark, src, keepVersions = 1)
    assert(deleted2 >= 4,
      s"vacuum must reclaim unreferenced dirs once the clone is gone " +
        s"(deleted $deleted2)")
  }

  test("clone vacuum touches only its own storage") {
    val src = freshSource()
    val tgt = tmpDir("clone-tgt") + "/t"
    SnapshotTable.shallowClone(spark, src, tgt)
    // diverge one partition several times, then vacuum the clone hard
    (1 to 3).foreach { i =>
      SnapshotTable.upsert(spark, tgt,
        Seq(("0", 500L + i, 9L)).toDF("src", "k", "v"), "k", Seq("src"))
    }
    SnapshotTable.vacuum(spark, tgt, keepVersions = 1)
    // the source is byte-for-byte intact
    assert(rowsOf(SnapshotTable.read(spark, src)).size == 40)
    // and the clone serves: untouched partitions from the source's
    // dirs, the diverged one from its own latest
    val got = rowsOf(SnapshotTable.read(spark, tgt))
    assert(got.count(_._2 >= 501L) == 3)
    assert(got.count(_._1 == "1") == 10)
  }

  test("SQL spelling + PURGE refusal") {
    LakeCatalog.install(spark)
    val src = freshSource()
    LakeCatalog.register(spark, "clone_src", src)
    val tgt = tmpDir("clone-sql") + "/t"
    val out = spark.sql(s"CREATE TABLE clone_sql SHALLOW CLONE " +
      s"lake.clone_src LOCATION '$tgt'").collect()(0)
    assert(out.getInt(1) == 1)
    assert(spark.sql("SELECT count(*) FROM lake.clone_sql")
      .collect()(0).getLong(0) == 40L)
    // purging a root with a live clone refuses loudly
    val e = intercept[Exception] {
      spark.sql("DROP TABLE lake.clone_src PURGE")
    }
    assert(e.getMessage.contains("shallow clone"), e.getMessage)
    // purge the clone, then the source purges cleanly
    spark.sql("DROP TABLE lake.clone_sql PURGE")
    spark.sql("DROP TABLE lake.clone_src PURGE")
    assert(!new java.io.File(src).exists())
    // VERSION AS OF in SQL
    val src2 = freshSource()
    LakeCatalog.register(spark, "clone_src2", src2)
    SnapshotTable.upsert(spark, src2,
      Seq(("0", 100L, 1L)).toDF("src", "k", "v"), "k", Seq("src"))
    val tgt2 = tmpDir("clone-sql2") + "/t"
    spark.sql(s"CREATE TABLE clone_sql2 SHALLOW CLONE lake.clone_src2 " +
      s"VERSION AS OF 1 LOCATION '$tgt2'")
    assert(spark.sql("SELECT count(*) FROM lake.clone_sql2")
      .collect()(0).getLong(0) == 40L)
    assert(spark.sql("SELECT count(*) FROM lake.clone_src2")
      .collect()(0).getLong(0) == 41L)
  }
}
