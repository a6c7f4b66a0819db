package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RENAME COLUMN / DROP COLUMN via column mapping (round 16): logical
  * names live in the recorded schema, physical names in the data files
  * never change — so both evolutions are metadata-only commits, old
  * directories keep serving, time travel returns the old names, and a
  * re-added name can never resurrect dropped bytes. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): (String, String) = {
    n += 1
    val root = tmpDir(s"colmap-$n")
    val base = spark.range(40L).select(
      (col("id") % 4).cast("string").as("src"),
      col("id").as("k"),
      (col("id") * 3 % 17).as("v"),
      concat(lit("t"), col("id")).as("note"))
    SnapshotTable.write(spark, root, base, Seq("src"),
      statsFor = Seq("v"), clusterBy = Seq("v"))
    SnapshotTable.declareKey(spark, root, "k")
    val name = s"colmap_$n"
    LakeCatalog.install(spark)
    LakeCatalog.register(spark, name, root)
    (name, root)
  }

  test("RENAME is metadata-only; old data serves; INSERT by new name; " +
      "time travel returns the old name") {
    val (name, root) = fresh()
    val dirsBefore = SnapshotTable.entriesFor(spark, root,
      SnapshotTable.latest(spark, root).get).toMap
    spark.sql(s"ALTER TABLE lake.$name RENAME COLUMN v TO score")
    // metadata-only: not a single data directory changed
    val vNow = SnapshotTable.latest(spark, root).get
    assert(SnapshotTable.entriesFor(spark, root, vNow).toMap == dirsBefore,
      "rename must not touch any data directory")
    // pre-evolution rows serve under the NEW logical name (API + SQL)
    val api = SnapshotTable.read(spark, root)
    assert(api.columns.toSeq == Seq("src", "k", "v", "note")
      .map(c => if (c == "v") "score" else c))
    assert(api.agg(sum($"score")).collect()(0).getLong(0) ==
      (0L until 40L).map(_ * 3 % 17).sum)
    assert(spark.sql(s"SELECT sum(score) FROM lake.$name")
      .collect()(0).getLong(0) == (0L until 40L).map(_ * 3 % 17).sum)
    // the old name is GONE, loudly
    intercept[Exception] {
      spark.sql(s"SELECT v FROM lake.$name").collect()
    }
    // INSERT by the new name lands; the file is written under the
    // ORIGINAL physical label, so one table never mixes labels
    spark.sql(s"INSERT INTO lake.$name VALUES ('0', 100, 7, 'new')")
    assert(spark.sql(
      s"SELECT score FROM lake.$name WHERE k = 100")
      .collect()(0).getLong(0) == 7L)
    // time travel to the pre-rename version returns the OLD schema
    val old = spark.sql(s"SELECT * FROM lake.$name VERSION AS OF $vNow")
    assert(old.columns.contains("score"))
    val preRename = spark.sql(
      s"SELECT * FROM lake.$name VERSION AS OF ${vNow - 1}")
    assert(preRename.columns.contains("v") &&
      !preRename.columns.contains("score"))
    // declared roles followed the rename
    assert(SnapshotTable.declaredColumns(spark, root) ==
      (Seq("score"), Seq("score")))
  }

  test("renamed stats column keeps skip-reads and metadata MIN/MAX " +
      "exact (#f lines key by physical name)") {
    val (name, root) = fresh()
    SnapshotTable.renameColumn(spark, root, "v", "score")
    // stats-pruned range read under the new logical name
    val got = SnapshotTable.readBetween(spark, root, "score", 3L, 5L)
      .select(sum($"score")).collect()(0).getLong(0)
    val want = (0L until 40L).map(_ * 3 % 17).filter(x => x >= 3 && x <= 5)
      .sum
    assert(got == want)
    // metadata-only aggregate answers MIN/MAX of the renamed column
    val q = spark.sql(
      s"SELECT min(score) AS mn, max(score) AS mx FROM lake.$name")
    val p = q.queryExecution.optimizedPlan
    assert(p.collectFirst {
      case s: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation => s }.isEmpty,
      s"expected a manifest-only plan:\n$p")
    val r = q.collect()(0)
    assert((r.getLong(0), r.getLong(1)) ==
      ((0L until 40L).map(_ * 3 % 17).min, (0L until 40L).map(_ * 3 % 17).max))
  }

  test("mutations keep working across a rename (MERGE/UPDATE/DELETE)") {
    val (name, root) = fresh()
    spark.sql(s"ALTER TABLE lake.$name RENAME COLUMN v TO score")
    spark.sql(s"UPDATE lake.$name SET score = 99 WHERE k = 1")
    assert(spark.sql(s"SELECT score FROM lake.$name WHERE k = 1")
      .collect()(0).getLong(0) == 99L)
    Seq((2L, 77L, "u"), (3L, 0L, "d")).toDF("k", "score", "op")
      .createOrReplaceTempView("cm_changes")
    spark.sql(s"""
      MERGE INTO lake.$name t USING cm_changes s ON t.k = s.k
      WHEN MATCHED AND s.op = 'd' THEN DELETE
      WHEN MATCHED THEN UPDATE SET score = s.score""")
    assert(spark.sql(s"SELECT score FROM lake.$name WHERE k = 2")
      .collect()(0).getLong(0) == 77L)
    assert(spark.sql(s"SELECT count(*) FROM lake.$name WHERE k = 3")
      .collect()(0).getLong(0) == 0L)
    spark.sql(s"DELETE FROM lake.$name WHERE score = 99")
    assert(spark.sql(s"SELECT count(*) FROM lake.$name WHERE k = 1")
      .collect()(0).getLong(0) == 0L)
  }

  test("DROP COLUMN hides the column without rewriting data; a " +
      "re-added name reads NULL, never the dropped bytes") {
    val (name, root) = fresh()
    val dirsBefore = SnapshotTable.entriesFor(spark, root,
      SnapshotTable.latest(spark, root).get).toMap
    spark.sql(s"ALTER TABLE lake.$name DROP COLUMN note")
    assert(SnapshotTable.entriesFor(spark, root,
      SnapshotTable.latest(spark, root).get).toMap == dirsBefore,
      "drop must not touch any data directory")
    assert(!SnapshotTable.read(spark, root).columns.contains("note"))
    intercept[Exception] {
      spark.sql(s"SELECT note FROM lake.$name").collect()
    }
    // time travel still serves the dropped column
    val vDrop = SnapshotTable.latest(spark, root).get
    assert(spark.sql(
      s"SELECT note FROM lake.$name VERSION AS OF ${vDrop - 1}")
      .collect().length == 40)
    // re-ADD the same name: pre-drop bytes must NOT resurrect — the
    // new column gets a fresh physical label and reads NULL everywhere
    spark.sql(s"ALTER TABLE lake.$name ADD COLUMN note STRING")
    val notes = spark.sql(s"SELECT note FROM lake.$name").collect()
    assert(notes.length == 40 && notes.forall(_.isNullAt(0)),
      "dropped bytes resurrected under the re-added name")
    // and a fresh INSERT's value round-trips through the new physical
    spark.sql(s"INSERT INTO lake.$name VALUES ('0', 200, 1, 'fresh')")
    assert(spark.sql(s"SELECT note FROM lake.$name WHERE k = 200")
      .collect()(0).getString(0) == "fresh")
  }

  test("refusals: partition column, row key, duplicate target") {
    val (name, root) = fresh()
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.$name RENAME COLUMN src TO origin")
    }
    assert(e1.getMessage.contains("partition column"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.$name DROP COLUMN src")
    }
    assert(e2.getMessage.contains("partition column"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.$name DROP COLUMN k")
    }
    assert(e3.getMessage.contains("row key"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.sql(s"ALTER TABLE lake.$name RENAME COLUMN v TO note")
    }
    assert(e4.getMessage.contains("already exists"), e4.getMessage)
  }

  test("rename-then-rename-back and rename of the row key") {
    val (name, root) = fresh()
    SnapshotTable.renameColumn(spark, root, "v", "score")
    SnapshotTable.renameColumn(spark, root, "score", "v")
    assert(SnapshotTable.read(spark, root).columns.toSeq ==
      Seq("src", "k", "v", "note"))
    assert(SnapshotTable.read(spark, root).agg(sum($"v"))
      .collect()(0).getLong(0) == (0L until 40L).map(_ * 3 % 17).sum)
    // renaming the row key re-labels the recorded key too
    SnapshotTable.renameColumn(spark, root, "k", "doc_key")
    assert(SnapshotTable.rowKey(spark, root).contains("doc_key"))
    SnapshotTable.upsert(spark, root,
      Seq(("0", 500L, 1L, "x")).toDF("src", "doc_key", "v", "note"),
      "doc_key", Seq("src"))
    assert(SnapshotTable.read(spark, root)
      .filter($"doc_key" === 500L).count() == 1L)
  }

  test("a data commit racing RENAME COLUMN cannot alias physical bytes " +
      "(round-16 advice item 2)") {
    val (_, root) = fresh()
    // inject a competing RENAME v->score between the upsert's staging
    // (which physicalized rows under the STALE mapping) and its commit
    var fired = false
    SnapshotTable.onBeforeCommit = () => {
      if (!fired) {
        fired = true
        SnapshotTable.renameColumn(spark, root, "v", "score")
      }
    }
    val before = SnapshotTable.read(spark, root)
      .agg(sum($"v")).collect()(0).getLong(0)
    try {
      // the upsert's frame still says "v" — committing it after the
      // rename (with mergeSchema, the evolving-batch mode) would append
      // a NEW logical column 'v' whose physical name IS the renamed
      // column's physical, i.e. two logical columns served by the same
      // bytes. The mapping fingerprint forces a re-merge; the re-merge
      // hits the unionSchema alias guard; the retries exhaust loudly.
      val e = intercept[SnapshotTable.ConcurrentWriteException] {
        SnapshotTable.upsert(spark, root,
          Seq(("0", 500L, 9L, "x")).toDF("src", "k", "v", "note"),
          "k", Seq("src"), mergeSchema = true)
      }
      assert(e.getMessage.contains("alias") ||
        e.getMessage.contains("column mapping"), e.getMessage)
      // default (projecting) mode: the re-merge sees the renamed table
      // and refuses the stale batch as schema-incomplete — also loud
      val e2 = intercept[IllegalArgumentException] {
        SnapshotTable.upsert(spark, root,
          Seq(("0", 501L, 9L, "x")).toDF("src", "k", "v", "note"),
          "k", Seq("src"))
      }
      assert(e2.getMessage.contains("missing table columns"),
        e2.getMessage)
    } finally SnapshotTable.onBeforeCommit = () => ()
    // no aliasing: exactly one logical column maps to physical 'v',
    // the refused row never half-landed, and the data still reads
    val after = SnapshotTable.read(spark, root)
    assert(after.columns.count(c => c == "v" || c == "score") == 1,
      s"aliased columns in ${after.columns.mkString(",")}")
    assert(after.columns.contains("score"))
    assert(after.filter($"k" === 500L).count() == 0,
      "refused upsert row must not land")
    assert(after.agg(sum($"score")).collect()(0).getLong(0) == before)
    // a retried upsert spelled by the CURRENT name lands cleanly
    SnapshotTable.upsert(spark, root,
      Seq(("0", 500L, 9L, "x")).toDF("src", "k", "score", "note"),
      "k", Seq("src"))
    assert(SnapshotTable.read(spark, root)
      .filter($"k" === 500L).select($"score")
      .collect()(0).getLong(0) == 9L)
  }
}
