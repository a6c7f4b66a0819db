package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL DML against lake-catalog tables (round 13): INSERT INTO /
  * INSERT OVERWRITE / DELETE FROM route through the SAME OCC manifest
  * commits as the API mutators — versioned, touched-partition-bounded,
  * time-travel-preserving — and immutable resolutions stay read-only. */
class LakeDmlSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshTable(): (String, String) = {
    n += 1
    val root = tmpDir(s"lakedml-$n")
    val base = spark.range(100L).select(
      concat(lit("s"), (col("id") % 4).cast("string")).as("src"),
      col("id").as("k"), (col("id") * 7 % 31).as("v"))
    SnapshotTable.write(spark, root, base, Seq("src"),
      statsFor = Seq("k"), clusterBy = Seq("k"))
    val name = s"lakedml_$n"
    LakeCatalog.install(spark)
    LakeCatalog.register(spark, name, root)
    (name, root)
  }

  test("INSERT INTO appends through an OCC commit; layout recorded") {
    val (name, root) = freshTable()
    assert(SnapshotTable.partitionColumns(spark, root) == Seq("src"))
    spark.sql(s"INSERT INTO lake.$name VALUES ('s1', 1000, 1)," +
      "('s9', 2000, 2)")
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2),
      "INSERT must mint exactly one new version")
    val live = SnapshotTable.read(spark, root)
    assert(live.count() == 102)
    assert(live.filter($"src" === "s9" && $"k" === 2000).count() == 1,
      "INSERT must create brand-new partitions when needed")
    // touched-partition bound: s0/s2/s3 directories carried forward
    val e1 = SnapshotTable.entriesFor(spark, root, 1).toMap
    val e2 = SnapshotTable.entriesFor(spark, root, 2).toMap
    Seq("s0", "s2", "s3").foreach { s =>
      assert(e1(s) == e2(s), s"INSERT rewrote untouched partition $s")
    }
    assert(e1("s1") != e2("s1"))
    // time travel: v1 is untouched by the append
    assert(spark.sql(s"SELECT count(*) FROM lake.$name VERSION AS OF 1")
      .collect()(0).getLong(0) == 100)
  }

  test("DELETE FROM removes matching rows only; history intact") {
    val (name, root) = freshTable()
    spark.sql(s"DELETE FROM lake.$name WHERE src = 's1' AND k < 50")
    val live = SnapshotTable.read(spark, root)
    assert(live.filter($"src" === "s1" && $"k" < 50).count() == 0)
    // s1 rows >= 50 and all other sources survive
    assert(live.count() == 100 - 13) // k % 4 == 1, k in [0, 50)
    assert(spark.sql(s"SELECT count(*) FROM lake.$name VERSION AS OF 1")
      .collect()(0).getLong(0) == 100)
    // an untranslatable predicate fails loudly rather than mis-deleting
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM lake.$name WHERE k % 3 = 0")
    }
    assert(e != null)
    assert(SnapshotTable.read(spark, root).count() == 100 - 13,
      "failed DELETE must not commit anything")
  }

  test("INSERT OVERWRITE replaces the table, keeps declarations") {
    val (name, root) = freshTable()
    spark.sql(s"INSERT OVERWRITE lake.$name " +
      "SELECT concat('s', cast(id % 2 AS string)), id, id * 3 " +
      "FROM range(10)")
    val live = SnapshotTable.read(spark, root)
    assert(live.count() == 10)
    assert(SnapshotTable.partitionColumns(spark, root) == Seq("src"))
    assert(SnapshotTable.declaredColumns(spark, root) ==
      (Seq("k"), Seq("k")),
      "full replace must restate the stats/cluster declarations")
    assert(spark.sql(s"SELECT count(*) FROM lake.$name VERSION AS OF 1")
      .collect()(0).getLong(0) == 100, "overwrite must not erase history")
  }

  test("immutable resolutions refuse DML; the live name accepts it") {
    val (name, root) = freshTable()
    val pinned = name + "_pin"
    LakeCatalog.register(spark, pinned, root, version = Some(1))
    val ins = intercept[Exception] {
      spark.sql(s"INSERT INTO lake.$pinned VALUES ('s1', 1, 1)")
    }
    assert(ins != null)
    val del = intercept[Exception] {
      spark.sql(s"DELETE FROM lake.$pinned WHERE k = 1")
    }
    assert(del.getMessage.toLowerCase.contains("immutable") ||
      del.getMessage.toLowerCase.contains("delete"),
      del.getMessage)
    assert(SnapshotTable.versions(spark, root) == Seq(1),
      "no refused statement may have committed")
  }

  test("INSERT INTO after schema evolution keeps the evolved value") {
    // Round-14 advice (high): append() used to derive the table's
    // column set from ONE data directory footer — after a mergeSchema
    // evolution that directory is typically pre-evolution, so the
    // projection silently dropped the inserted row's evolved-column
    // value (SQL accepted it, NULL landed). The column set now comes
    // from the manifest's recorded union schema.
    val (name, root) = freshTable()
    // evolve partition s2 only: s0/s1/s3 directories stay pre-evolution
    SnapshotTable.upsert(spark, root,
      Seq(("s2", 9999L, 1L, 5L)).toDF("src", "k", "v", "extra"),
      "k", Seq("src"), mergeSchema = true)
    spark.sql(s"INSERT INTO lake.$name VALUES ('s0', 7000, 1, 77)")
    val got = spark.sql(
      s"SELECT extra FROM lake.$name WHERE k = 7000").collect()
    assert(got.length == 1 && !got(0).isNullAt(0) &&
      got(0).getLong(0) == 77L,
      s"evolved column dropped by INSERT: ${got.mkString(",")}")
  }

  test("INSERT OVERWRITE PARTITION replaces only that partition") {
    val (name, root) = freshTable()
    spark.sql(s"INSERT OVERWRITE lake.$name PARTITION (src = 's1') " +
      "SELECT id, id * 2 FROM range(3)")
    val live = SnapshotTable.read(spark, root)
    assert(live.filter($"src" === "s1").count() == 3,
      "the named partition must be replaced wholesale")
    assert(live.filter($"src" =!= "s1").count() == 75,
      "other partitions must carry forward")
    // one commit, carried forward = same directories, not rewritten
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2),
      "partition overwrite must be ONE atomic commit")
    val e1 = SnapshotTable.entriesFor(spark, root, 1).toMap
    val e2 = SnapshotTable.entriesFor(spark, root, 2).toMap
    Seq("s0", "s2", "s3").foreach { s =>
      assert(e1(s) == e2(s), s"partition overwrite rewrote untouched $s")
    }
    assert(spark.sql(s"SELECT count(*) FROM lake.$name VERSION AS OF 1")
      .collect()(0).getLong(0) == 100, "history intact")
  }

  test("partitionOverwriteMode=dynamic is refused with guidance") {
    val (name, _) = freshTable()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // Spark's own capability check refuses this loudly (dynamic
      // overwrite has no V1 fallback — it would bypass the manifest
      // commit); the supported routes are the static PARTITION spec
      // or SnapshotTable.overwritePartitions
      val e = intercept[Exception] {
        spark.sql(s"INSERT OVERWRITE lake.$name VALUES ('s1', 1, 2)")
      }
      assert(Option(e.getMessage).exists(
        _.toLowerCase.contains("dynamic overwrite")),
        s"expected the loud dynamic-overwrite refusal, got: $e")
    } finally
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("SQL and API mutations interleave on one version line") {
    val (name, root) = freshTable()
    spark.sql(s"INSERT INTO lake.$name VALUES ('s1', 1000, 1)")
    SnapshotTable.upsert(spark, root,
      Seq(("s1", 1000L, 42L)).toDF("src", "k", "v"), "k", Seq("src"))
    spark.sql(s"DELETE FROM lake.$name WHERE k = 7")
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2, 3, 4))
    val live = SnapshotTable.read(spark, root)
    assert(live.filter($"k" === 1000 && $"v" === 42).count() == 1,
      "the API upsert must see the SQL-inserted row")
    assert(live.filter($"k" === 7).count() == 0)
    // the change feed reads the SQL commits like any others
    val feed = ChangeFeed.between(spark, root, 1)
    assert(feed.filter(col(ChangeFeed.VersionCol) === 2 &&
      col(ChangeFeed.ChangeTypeCol) === "insert" &&
      $"k" === 1000).count() == 1)
    assert(feed.filter(col(ChangeFeed.VersionCol) === 4 &&
      col(ChangeFeed.ChangeTypeCol) === "delete" &&
      $"k" === 7).count() == 1)
  }
}
