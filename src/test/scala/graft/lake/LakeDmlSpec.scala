package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL DML against lake-catalog tables (round 13): INSERT INTO /
  * INSERT OVERWRITE / DELETE FROM route through the SAME OCC manifest
  * commits as the API mutators — versioned, touched-partition-bounded,
  * time-travel-preserving — and immutable resolutions stay read-only. */
// excluded from the default `sbt test` (CI budget) — run with
// GRAFT_TEST_ALL=1 or `testOnly`; see build.sbt
@org.scalatest.tags.Slow
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

  // ---- round 15: MERGE INTO / UPDATE / ALTER TABLE / table_changes ----

  test("MERGE INTO lands update+delete+insert as ONE commit, " +
      "identical to applyChanges") {
    val (name, root) = freshTable()
    SnapshotTable.declareKey(spark, root, "k") // metadata-only commit
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2))
    assert(SnapshotTable.rowKey(spark, root).contains("k"))
    val changes = Seq(
      ("s1", 1L, 777L, "u"),   // matched -> UPDATE
      ("s1", 5L, -1L, "d"),    // matched -> DELETE
      ("s2", 5000L, 888L, "u") // unmatched -> INSERT
    ).toDF("src", "k", "v", "op")
    changes.createOrReplaceTempView("mergesrc")
    spark.sql(s"""MERGE INTO lake.$name AS t USING mergesrc AS s
      ON t.k = s.k
      WHEN MATCHED AND s.op = 'd' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED AND s.op <> 'd' THEN
        INSERT (src, k, v) VALUES (s.src, s.k, s.v)""")
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2, 3),
      "MERGE must mint exactly one version")
    val live = SnapshotTable.read(spark, root)
    assert(live.filter($"k" === 1 && $"v" === 777).count() == 1)
    assert(live.filter($"k" === 5).count() == 0)
    assert(live.filter($"k" === 5000 && $"src" === "s2" &&
      $"v" === 888).count() == 1)
    assert(live.count() == 100) // 100 - 1 deleted + 1 inserted
    // untouched partitions carried forward (only s1/s2 touched)
    val e2 = SnapshotTable.entriesFor(spark, root, 2).toMap
    val e3 = SnapshotTable.entriesFor(spark, root, 3).toMap
    Seq("s0", "s3").foreach(s =>
      assert(e2(s) == e3(s), s"MERGE rewrote untouched partition $s"))
    assert(spark.sql(s"SELECT count(*) FROM lake.$name VERSION AS OF 1")
      .collect()(0).getLong(0) == 100, "history intact")
    // the SQL spelling is the SAME commit as the API mutator: a twin
    // table taking the identical batch via applyChanges matches rows
    val twin = tmpDir("lakedml-twin")
    val base = spark.range(100L).select(
      concat(lit("s"), (col("id") % 4).cast("string")).as("src"),
      col("id").as("k"), (col("id") * 7 % 31).as("v"))
    SnapshotTable.write(spark, twin, base, Seq("src"),
      statsFor = Seq("k"), clusterBy = Seq("k"))
    SnapshotTable.applyChanges(spark, twin, changes, "k", Seq("src"), "op")
    val got = live.orderBy("k").collect().map(_.toString).toSeq
    val want = SnapshotTable.read(spark, twin)
      .select("src", "k", "v").orderBy("k").collect()
      .map(_.toString).toSeq
    assert(got == want, "SQL MERGE diverged from applyChanges")
  }

  test("MERGE refuses: no recorded key / historical pin / cardinality " +
      "/ partition move / unmatched-key insert") {
    val (name, root) = freshTable()
    Seq(("s1", 1L, 9L)).toDF("src", "k", "v")
      .createOrReplaceTempView("m_one")
    // no recorded row key yet -> loud, with the declare path named
    val noKey = intercept[Exception] {
      spark.sql(s"MERGE INTO lake.$name t USING m_one s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v")
    }
    assert(noKey.getMessage.contains("declareKey"), noKey.getMessage)
    SnapshotTable.declareKey(spark, root, "k")
    // a version-pinned binding is immutable
    val pinned = name + "_mpin"
    LakeCatalog.register(spark, pinned, root, version = Some(1))
    val hist = intercept[Exception] {
      spark.sql(s"MERGE INTO lake.$pinned t USING m_one s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v")
    }
    assert(hist.getMessage.toLowerCase.contains("immutable"),
      hist.getMessage)
    // two source rows matching one target row -> ambiguous
    Seq(("s1", 1L, 9L), ("s1", 1L, 10L)).toDF("src", "k", "v")
      .createOrReplaceTempView("m_dup")
    val card = intercept[Exception] {
      spark.sql(s"MERGE INTO lake.$name t USING m_dup s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v")
    }
    assert(card.getMessage.toLowerCase.contains("cardinality"),
      card.getMessage)
    // an update may not move a key across partitions
    val move = intercept[Exception] {
      spark.sql(s"MERGE INTO lake.$name t USING m_one s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET src = 's0'")
    }
    assert(move.getMessage.toLowerCase.contains("partition"),
      move.getMessage)
    // a non-key ON condition whose insert collides with a live key
    val collide = intercept[Exception] {
      spark.sql(s"MERGE INTO lake.$name t USING m_one s " +
        "ON t.k = s.k AND t.v < -100 " +
        "WHEN NOT MATCHED THEN INSERT (src, k, v) VALUES (s.src, s.k, s.v)")
    }
    assert(collide.getMessage.toLowerCase.contains("collides"),
      collide.getMessage)
    assert(SnapshotTable.read(spark, root)
      .filter($"k" === 1 && $"v" =!= 7).count() == 0,
      "no refused MERGE may have mutated the table")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE acts on unreferenced rows") {
    val (name, root) = freshTable()
    SnapshotTable.declareKey(spark, root, "k")
    // keep keys < 4, delete every other target row not in the source
    spark.range(4).select(lit("s0").as("src"), $"id".as("k"),
      lit(0L).as("v")).createOrReplaceTempView("m_keep")
    spark.sql(s"MERGE INTO lake.$name t USING m_keep s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET v = t.v + 1000 " +
      "WHEN NOT MATCHED BY SOURCE AND t.k >= 90 THEN DELETE")
    val live = SnapshotTable.read(spark, root)
    assert(live.count() == 90, "k in [90,100) deleted")
    assert(live.filter($"k" < 4 && $"v" < 1000).count() == 0,
      "matched rows updated from the target's own values")
    assert(live.filter($"k" >= 4 && $"k" < 90 && $"v" >= 1000).count() == 0)
  }

  test("UPDATE rewrites matching rows; partition moves are handled") {
    val (name, root) = freshTable()
    spark.sql(s"UPDATE lake.$name SET v = v + 1000 " +
      "WHERE src = 's1' AND k < 8")
    val live = SnapshotTable.read(spark, root)
    assert(live.filter($"v" >= 1000).count() == 2, "k=1 and k=5 match")
    assert(live.filter($"k" === 1 && $"v" === 1007).count() == 1)
    assert(live.count() == 100)
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2),
      "UPDATE must be ONE commit")
    // unlike MERGE, UPDATE routes through overwriteWhere and may move
    // rows across partitions (delete-matching + insert, one commit)
    spark.sql(s"UPDATE lake.$name SET src = 's9' WHERE k = 3")
    val moved = SnapshotTable.read(spark, root)
    assert(moved.filter($"k" === 3 && $"src" === "s9").count() == 1)
    assert(moved.filter($"k" === 3).count() == 1, "no duplicate row")
    assert(moved.count() == 100)
    assert(spark.sql(s"SELECT count(*) FROM lake.$name VERSION AS OF 1")
      .collect()(0).getLong(0) == 100, "history intact")
    // subqueries are refused loudly (put the logic in a MERGE source)
    val sub = intercept[Exception] {
      spark.sql(s"UPDATE lake.$name SET v = 0 WHERE k IN " +
        s"(SELECT k FROM lake.$name WHERE v > 1000)")
    }
    assert(sub.getMessage.toLowerCase.contains("subquer"), sub.getMessage)
  }

  test("ALTER TABLE ADD COLUMN: metadata-only schema evolution") {
    val (name, root) = freshTable()
    spark.sql(s"ALTER TABLE lake.$name ADD COLUMN extra BIGINT")
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2),
      "ALTER must mint one metadata version")
    assert(SnapshotTable.entriesFor(spark, root, 1) ==
      SnapshotTable.entriesFor(spark, root, 2),
      "ALTER must not touch any data directory")
    // live reads serve NULL for pre-evolution rows
    val live = spark.sql(s"SELECT * FROM lake.$name")
    assert(live.columns.toSeq == Seq("src", "k", "v", "extra"))
    assert(live.filter($"extra".isNotNull).count() == 0)
    // time travel returns the pre-ALTER schema
    assert(spark.sql(s"SELECT * FROM lake.$name VERSION AS OF 1")
      .columns.toSeq == Seq("src", "k", "v"))
    // the next INSERT must (and can) carry the evolved column
    spark.sql(s"INSERT INTO lake.$name VALUES ('s1', 6000, 1, 42)")
    assert(spark.sql(s"SELECT extra FROM lake.$name WHERE k = 6000")
      .collect()(0).getLong(0) == 42L)
    // duplicate / unsupported changes are refused loudly
    val dup = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.$name ADD COLUMN extra STRING")
    }
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    // DROP COLUMN works since round 16 (column mapping) — the deep
    // pins live in ColumnMappingSpec; here just the catalog routing
    spark.sql(s"ALTER TABLE lake.$name DROP COLUMN v")
    assert(!spark.sql(s"SELECT * FROM lake.$name").columns.contains("v"))
    val pinned = name + "_apin"
    LakeCatalog.register(spark, pinned, root, version = Some(1))
    val pin = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.$pinned ADD COLUMN e2 INT")
    }
    assert(pin.getMessage.toLowerCase.contains("immutable"), pin.getMessage)
  }

  test("table_changes('t', from[, to]) serves the feed from SQL") {
    val (name, root) = freshTable()
    spark.sql(s"INSERT INTO lake.$name VALUES ('s1', 1000, 1)")
    spark.sql(s"DELETE FROM lake.$name WHERE k = 7")
    val sqlFeed = spark.sql(s"SELECT * FROM table_changes('$name', 1)")
    val api = ChangeFeed.between(spark, root, 1)
    assert(sqlFeed.columns.toSeq == api.columns.toSeq)
    val key = Seq("k", ChangeFeed.VersionCol, ChangeFeed.ChangeTypeCol)
    assert(sqlFeed.orderBy(key.map(col): _*).collect().toSeq ==
      api.orderBy(key.map(col): _*).collect().toSeq,
      "the TVF must serve exactly ChangeFeed.between's rows")
    // an explicit upper bound scopes the range
    assert(spark.sql(s"SELECT * FROM table_changes('$name', 1, 2)")
      .select(ChangeFeed.VersionCol).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // unknown binding and non-literal args fail loudly
    val unknown = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('no_such_binding', 1)")
    }
    assert(unknown.getMessage.contains("no lake binding"),
      unknown.getMessage)
  }

  test("table_changes_updates pairs update faces via the recorded key") {
    // the Delta-CDF update_preimage/postimage surface as SQL (round 16):
    // pairing is keyed, and the manifest records the key (#rowkey), so
    // the statement restates nothing
    val (name, root) = freshTable()
    SnapshotTable.declareKey(spark, root, "k")
    spark.sql(s"UPDATE lake.$name SET v = 999 WHERE k = 5")
    val latest = SnapshotTable.latest(spark, root).get
    val rows = spark.sql(
      s"SELECT * FROM table_changes_updates('$name', ${latest - 1})")
      .filter(col("k") === 5)
      .select(col(ChangeFeed.ChangeTypeCol), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(rows == Seq(
      (ChangeFeed.UpdatePost, 999L),
      (ChangeFeed.UpdatePre, 5L * 7 % 31)), rows.toString)
    // a key-less table refuses rather than mislabeling
    val (name2, _) = freshTable()
    spark.sql(s"DELETE FROM lake.$name2 WHERE k = 3")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes_updates('$name2', 1)")
        .collect()
    }
    assert(e.getMessage.contains("records no row key"), e.getMessage)
  }

  // ---- round 15: OPTIMIZE / VACUUM as SQL statements ----------------

  test("OPTIMIZE lake.t compacts fragmented partitions; rows and " +
      "history intact") {
    val (name, root) = freshTable()
    // fragment one partition: an API append laying s1 out in 4 files
    SnapshotTable.append(spark, root,
      spark.range(5L).select(lit("s1").as("src"),
        (col("id") + 5000).as("k"), col("id").as("v")),
      filesPerPartition = 4)
    def filesOf(dir: String): Int =
      new java.io.File(root, dir).listFiles()
        .count(_.getName.endsWith(".parquet"))
    val before = SnapshotTable.entriesFor(spark, root,
      SnapshotTable.latest(spark, root).get).toMap
    assert(filesOf(before("s1")) > 1, "fixture must be fragmented")
    val rowsBefore = spark.sql(s"SELECT * FROM lake.$name")
      .collect().toSet
    val out = spark.sql(s"OPTIMIZE lake.$name").collect()
    assert(out.length == 1 && out(0).getInt(0) ==
      SnapshotTable.latest(spark, root).get,
      "OPTIMIZE must return the resulting version")
    val after = SnapshotTable.entriesFor(spark, root,
      SnapshotTable.latest(spark, root).get).toMap
    assert(filesOf(after("s1")) == 1,
      s"s1 must compact to one file, has ${filesOf(after("s1"))}")
    assert(spark.sql(s"SELECT * FROM lake.$name").collect().toSet ==
      rowsBefore, "OPTIMIZE must not change a single row")
    // pre-compaction versions still read (history intact)
    assert(spark.sql(s"SELECT count(*) FROM lake.$name VERSION AS OF 1")
      .collect()(0).getLong(0) == 100)
    // a pinned binding refuses
    val pinned = s"${name}_pin"
    LakeCatalog.register(spark, pinned, root, version = Some(1))
    val pin = intercept[Exception] {
      spark.sql(s"OPTIMIZE lake.$pinned")
    }
    assert(pin.getMessage.contains("immutable"), pin.getMessage)
  }

  test("VACUUM lake.t RETAIN n VERSIONS drops old versions and their " +
      "unreferenced data") {
    val (name, root) = freshTable()
    spark.sql(s"INSERT INTO lake.$name VALUES ('s1', 9000, 1)")
    spark.sql(s"DELETE FROM lake.$name WHERE src = 's3'")
    val latest = SnapshotTable.latest(spark, root).get
    assert(latest >= 3)
    val out = spark.sql(s"VACUUM lake.$name RETAIN 1 VERSIONS").collect()
    assert(out.length == 1 && out(0).getInt(0) == latest - 1,
      s"must drop exactly the ${latest - 1} pre-horizon manifests: " +
        out.mkString(","))
    assert(out(0).getInt(1) > 0, "s3's retired directory must be deleted")
    // the latest version still reads in full; history is gone LOUDLY
    assert(spark.sql(s"SELECT count(*) FROM lake.$name")
      .collect()(0).getLong(0) == 101 - 25) // 100 + 1 insert - src s3
    val gone = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM lake.$name VERSION AS OF 1")
        .collect()
    }
    assert(gone.getMessage.contains("unknown version"), gone.getMessage)
    // the RETAIN clause is mandatory: a bare VACUUM falls through to
    // Spark's parser and fails as ordinary SQL, never as a default-
    // horizon delete
    intercept[Exception] { spark.sql(s"VACUUM lake.$name") }
    assert(SnapshotTable.versions(spark, root) == Seq(latest),
      "the malformed statement must not have vacuumed anything")
  }

  test("maintenance statements addressed at ANOTHER catalog refuse " +
      "instead of resolving the same-named lake binding") {
    // `VACUUM ice.t RETAIN …` (a typo'd or foreign catalog) must not
    // silently vacuum the lake binding 't' — for VACUUM that
    // misdirection is destructive
    val (name, root) = freshTable()
    val before = SnapshotTable.versions(spark, root)
    val e = intercept[Exception] {
      spark.sql(s"VACUUM ice.$name RETAIN 1 VERSIONS")
    }
    assert(e.getMessage.contains("not a graft lake catalog"),
      e.getMessage)
    assert(SnapshotTable.versions(spark, root) == before,
      "the misdirected VACUUM must not have touched the lake table")
    val o = intercept[Exception] { spark.sql(s"OPTIMIZE ice.$name") }
    assert(o.getMessage.contains("not a graft lake catalog"),
      o.getMessage)
  }

  test("maintenance statements at a REGISTERED foreign catalog fall " +
      "through to the delegate parser (round-15 advice)") {
    // with another lakehouse extension in the chain (Delta/Iceberg),
    // their OPTIMIZE/VACUUM must reach THEIR parser — here the
    // delegate is Spark's, so the statement dies as ordinary parse
    // error, never in the lake resolver
    val (name, _) = freshTable()
    spark.conf.set("spark.sql.catalog.other", "org.example.OtherCatalog")
    try {
      intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        spark.sql(s"OPTIMIZE other.$name")
      }
      intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        spark.sql(s"VACUUM other.$name RETAIN 1 VERSIONS")
      }
    } finally spark.conf.unset("spark.sql.catalog.other")
  }

  test("SHOW PARTITIONS and DESCRIBE HISTORY serve from the manifest") {
    val (name, root) = freshTable()
    // SHOW PARTITIONS: native Spark statement through the DSv2
    // SupportsPartitionManagement seam — manifest keys, no file I/O
    val parts = spark.sql(s"SHOW PARTITIONS lake.$name")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(parts == Seq("src=s0", "src=s1", "src=s2", "src=s3"), parts)
    // a partition spec narrows the listing
    assert(spark.sql(s"SHOW PARTITIONS lake.$name PARTITION (src='s2')")
      .collect().map(_.getString(0)).toSeq == Seq("src=s2"))
    // a partition-column DELETE (pure-metadata commit) drops the key
    spark.sql(s"DELETE FROM lake.$name WHERE src = 's3'")
    assert(spark.sql(s"SHOW PARTITIONS lake.$name").count() == 3)
    // partition DDL is refused loudly — partitions are owned by the
    // table's committed mutations
    val ddl = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.$name DROP PARTITION (src='s0')")
    }
    assert(ddl.getMessage.contains("committed mutations"), ddl.getMessage)
    // DESCRIBE HISTORY: newest first, the TIMESTAMP AS OF clock
    val hist = spark.sql(s"DESCRIBE HISTORY lake.$name").collect()
    assert(hist.map(_.getInt(0)).toSeq == Seq(2, 1),
      hist.mkString(","))
    assert(hist.map(_.getString(2)).toSeq == Seq("delta", "full"))
    assert(hist.forall(!_.isNullAt(1)), "every commit carries its stamp")
    // v2 was the partition delete: one key removed, nothing added
    assert(hist(0).getInt(3) == 0 && hist(0).getInt(4) == 1)
    assert(hist(1).getInt(3) == 4 && hist(1).getInt(4) == 0)
    // the history stamp IS the TIMESTAMP AS OF clock: asking for the
    // v1 commit instant serves v1
    val t1 = hist(1).getTimestamp(1)
    assert(spark.sql(s"SELECT count(*) FROM lake.$name TIMESTAMP AS OF " +
      s"'${t1}'").collect()(0).getLong(0) == 100)
  }

  test("MERGE UPDATE refuses to assign the recorded row key; VACUUM " +
      "protects session-pinned versions; DESCRIBE history delegates") {
    val (name, root) = freshTable()
    SnapshotTable.declareKey(spark, root, "k")
    // (1) the MERGE path enforces the same key invariant as UPDATE
    spark.range(3L).select(lit("s1").as("src"), (col("id") * 4 + 1).as("k"),
      lit(0L).as("v")).createOrReplaceTempView("mergekey_src")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO lake.$name t USING mergekey_src s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET k = s.k + 1000, v = s.v""")
    }
    assert(e.getMessage.contains("row key"), e.getMessage)
    // a key-identity UPDATE clause is fine
    spark.sql(s"""MERGE INTO lake.$name t USING mergekey_src s
      ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v""")
    assert(SnapshotTable.read(spark, root)
      .filter(col("k") === 1).select("v").collect()(0).getLong(0) == 0L)
    // (2) VACUUM spares a version a session binding pins
    spark.sql(s"INSERT INTO lake.$name VALUES ('s1', 9100, 7)") // v3
    LakeCatalog.register(spark, s"${name}_pin1", root, version = Some(1))
    spark.sql(s"VACUUM lake.$name RETAIN 1 VERSIONS").collect()
    assert(SnapshotTable.versions(spark, root).contains(1),
      "the session-pinned v1 must survive the retention horizon")
    assert(spark.sql(s"SELECT count(*) FROM lake.${name}_pin1")
      .collect()(0).getLong(0) == 100)
    // (3) DESCRIBE HISTORY only intercepts real lake bindings — a
    // table that happens to be named `history` keeps Spark's own
    // DESCRIBE <table> <column> grammar
    spark.range(3).select(col("id").as("event_time"))
      .createOrReplaceTempView("history")
    val d = spark.sql("DESCRIBE history event_time").collect()
    assert(d.exists(r =>
      r.getString(0) == "col_name" && r.getString(1) == "event_time"),
      d.mkString(","))
  }

  test("UPDATE refuses to assign the table's recorded row key") {
    val (name, root) = freshTable()
    SnapshotTable.declareKey(spark, root, "k")
    val e = intercept[Exception] {
      spark.sql(s"UPDATE lake.$name SET k = 0 WHERE src = 's1'")
    }
    assert(e.getMessage.contains("row key"), e.getMessage)
    // non-key assignments still work, and the key column is untouched
    spark.sql(s"UPDATE lake.$name SET v = -5 WHERE src = 's1' AND k = 1")
    val live = SnapshotTable.read(spark, root)
    assert(live.filter(col("k") === 1).select(col("v"))
      .collect()(0).getLong(0) == -5L)
    assert(live.filter(col("k") === 0).count() == 1,
      "exactly the original k=0 row — no duplicates planted")
  }
}
