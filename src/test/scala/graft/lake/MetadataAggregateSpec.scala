package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions._

/** Metadata-only aggregates over lake tables ([[MetadataAggregate]]):
  * COUNT(*) / MIN / MAX / GROUP BY partition answer from the
  * manifest's `#n` row counts and `#f` stats — zero file opens —
  * while anything the manifest cannot answer exactly falls through to
  * the data scan. The destructive pin is the proof style the lake
  * layer uses everywhere: garbage the parquet bytes and the metadata
  * answer must still land while a data-column query fails loudly. */
class MetadataAggregateSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshTable(): (String, String) = {
    n += 1
    val root = tmpDir(s"metaagg-$n")
    val name = s"metaagg_$n"
    SnapshotTable.write(spark, root, baseRows(), Seq("src"),
      statsFor = Seq("k", "w", "x", "ts"))
    LakeCatalog.install(spark)
    LakeCatalog.register(spark, name, root)
    (name, root)
  }

  /** 100 rows over 4 partitions with stats columns of every
    * round-trip-sensitive flavor: long, string, double with a
    * non-terminating binary fraction, microsecond timestamp. */
  private def baseRows(): DataFrame =
    spark.range(100L).select(
      concat(lit("s"), (col("id") % 4).cast("string")).as("src"),
      col("id").as("k"),
      concat(lit("w"), lpad((col("id") * 13 % 97).cast("string"), 2, "0"))
        .as("w"),
      (col("id").cast("double") * 0.1 + 1e-7).as("x"),
      timestamp_seconds(col("id").cast("double") * 86461.0 + 0.123456)
        .as("ts"),
      (col("id") * 3).as("u")) // deliberately NOT in statsFor

  private def isMetadataAnswered(df: DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan
    p.collectFirst { case s: DataSourceV2ScanRelation => s }.isEmpty &&
      p.collectFirst { case r: DataSourceV2Relation => r }.isEmpty &&
      p.collectFirst { case l: LocalRelation => l }.nonEmpty
  }

  private def corruptData(root: String): Unit = {
    val data = new java.io.File(root, "data")
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(walk)
      else if (f.getName.endsWith(".parquet"))
        java.nio.file.Files.write(f.toPath,
          "not parquet anymore".getBytes("UTF-8"))
    walk(data)
  }

  test("COUNT/MIN/MAX/GROUP BY partition answer from the manifest " +
      "and match the data scan") {
    val (name, _) = freshTable()
    val q = spark.sql(s"""
      SELECT src, count(*) AS n, min(k) AS mn_k, max(k) AS mx_k,
             min(w) AS mn_w, max(w) AS mx_w,
             min(x) AS mn_x, max(x) AS mx_x,
             min(ts) AS mn_ts, max(ts) AS mx_ts
      FROM lake.$name WHERE src >= 's1' GROUP BY src ORDER BY src""")
    assert(isMetadataAnswered(q), "expected a manifest-only plan:\n" +
      q.queryExecution.optimizedPlan)
    val expect = baseRows().filter($"src" >= "s1").groupBy($"src")
      .agg(count(lit(1)).as("n"), min($"k").as("mn_k"), max($"k").as("mx_k"),
        min($"w").as("mn_w"), max($"w").as("mx_w"),
        min($"x").as("mn_x"), max($"x").as("mx_x"),
        min($"ts").as("mn_ts"), max($"ts").as("mx_ts"))
      .orderBy($"src")
    assert(q.collect().toSeq == expect.collect().toSeq,
      "metadata answer must be value-identical to the data scan")
  }

  test("global count and DISTINCT partition values are metadata-only") {
    val (name, _) = freshTable()
    val c = spark.sql(s"SELECT count(*) AS n FROM lake.$name")
    assert(isMetadataAnswered(c))
    assert(c.collect()(0).getLong(0) == 100)
    val d = spark.sql(s"SELECT DISTINCT src FROM lake.$name")
    assert(isMetadataAnswered(d))
    assert(d.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("s0", "s1", "s2", "s3"))
  }

  test("destructive: the answer survives garbaged parquet bytes; a " +
      "data-column query does not") {
    val (name, root) = freshTable()
    corruptData(root)
    val q = spark.sql(
      s"SELECT src, count(*) AS n, max(k) AS mx FROM lake.$name " +
        "GROUP BY src ORDER BY src")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("s0", 25L, 96L), ("s1", 25L, 97L),
        ("s2", 25L, 98L), ("s3", 25L, 99L)),
      "manifest-only aggregate must not open a single data file")
    intercept[Exception] {
      spark.sql(s"SELECT sum(k) FROM lake.$name").collect()
    }
  }

  test("anything the manifest cannot answer exactly takes the scan") {
    val (name, root) = freshTable()
    def scans(sql: String): Boolean = {
      val p = spark.sql(sql).queryExecution.optimizedPlan
      p.collectFirst { case s: DataSourceV2ScanRelation => s }.nonEmpty ||
        p.collectFirst { case r: DataSourceV2Relation => r }.nonEmpty
    }
    // data-column filter; COUNT(col) (null-counting); DISTINCT agg;
    // SUM (not derivable from min/max/rows); un-stats'd column
    assert(scans(s"SELECT count(*) FROM lake.$name WHERE k > 10"))
    assert(scans(s"SELECT count(w) FROM lake.$name"))
    assert(scans(s"SELECT count(DISTINCT src) FROM lake.$name"))
    assert(scans(s"SELECT sum(k) FROM lake.$name"))
    assert(scans(s"SELECT min(u) FROM lake.$name")) // no #f for u
    // … while MIN/MAX of the PARTITION column needs no stats at all
    // (the value is in the manifest key)
    val pmin = spark.sql(s"SELECT min(src) AS m FROM lake.$name")
    assert(isMetadataAnswered(pmin))
    assert(pmin.collect()(0).getString(0) == "s0")
    // and the scan path still answers correctly (data intact here)
    assert(spark.sql(s"SELECT count(*) AS n FROM lake.$name WHERE k > 10")
      .collect()(0).getLong(0) == 89)
    // a manifest stripped of its #n lines (pre-recording vintage)
    // disables the rewrite rather than miscounting
    val vdir = new java.io.File(root, "_versions")
    vdir.listFiles().filter(_.getName.endsWith(".manifest")).foreach { f =>
      val kept = scala.io.Source.fromFile(f, "UTF-8").getLines()
        .filterNot(_.startsWith("#n\t")).mkString("", "\n", "\n")
      java.nio.file.Files.write(f.toPath, kept.getBytes("UTF-8"))
    }
    LakeCatalog.install(spark) // re-resolve (manifest cache, if any)
    assert(scans(s"SELECT count(*) FROM lake.$name"))
    assert(spark.sql(s"SELECT count(*) AS n FROM lake.$name")
      .collect()(0).getLong(0) == 100)
  }

  test("counts stay exact through upsert, row-level DELETE, " +
      "pure-metadata partition DELETE, and time travel") {
    val (name, root) = freshTable()
    // v2: upsert replaces 10 keys and inserts 5 new ones into s0
    val ups = spark.range(10L).select(
      lit("s1").as("src"), (col("id") * 4 + 1).as("k"),
      lit("wUP").as("w"), lit(0.5).as("x"),
      timestamp_seconds(lit(1)).as("ts"), lit(0L).as("u"))
      .unionByName(spark.range(5L).select(
        lit("s0").as("src"), (col("id") + 1000).as("k"),
        lit("wNEW").as("w"), lit(0.5).as("x"),
        timestamp_seconds(lit(2)).as("ts"), lit(0L).as("u")))
    SnapshotTable.upsert(spark, root, ups, "k", Seq("src"))
    // v3: row-level delete inside s2
    spark.sql(s"DELETE FROM lake.$name WHERE src = 's2' AND k < 20")
    // v4: partition-column delete — a pure-metadata commit
    spark.sql(s"DELETE FROM lake.$name WHERE src = 's3'")
    val q = spark.sql(
      s"SELECT src, count(*) AS n FROM lake.$name GROUP BY src ORDER BY src")
    assert(isMetadataAnswered(q))
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("s0", 30L), ("s1", 25L), ("s2", 20L)),
      "counts must track every mutation flavor")
    // time travel: the pre-mutation version still counts 100, from v1
    // metadata alone
    val tt = spark.sql(s"SELECT count(*) AS n FROM lake.$name VERSION AS OF 1")
    assert(isMetadataAnswered(tt))
    assert(tt.collect()(0).getLong(0) == 100)
  }

  test("null partition values group and count correctly") {
    n += 1
    val root = tmpDir(s"metaagg-$n")
    val name = s"metaagg_$n"
    val rows = spark.range(20L).select(
      when(col("id") % 5 === 0, lit(null.asInstanceOf[String]))
        .otherwise(concat(lit("s"), (col("id") % 2).cast("string")))
        .as("src"),
      col("id").as("k"))
    SnapshotTable.write(spark, root, rows, Seq("src"), statsFor = Seq("k"))
    LakeCatalog.install(spark)
    LakeCatalog.register(spark, name, root)
    val q = spark.sql(s"SELECT src, count(*) AS n, min(k) AS mn " +
      s"FROM lake.$name GROUP BY src ORDER BY src NULLS FIRST")
    assert(isMetadataAnswered(q))
    assert(q.collect().map(r =>
      (if (r.isNullAt(0)) "NULL" else r.getString(0), r.getLong(1),
        r.getLong(2))).toSeq ==
      Seq(("NULL", 4L, 0L), ("s0", 8L, 2L), ("s1", 8L, 1L)))
    // `src IS NULL` composes with the metadata path (filter evaluates
    // over the partition tuples)
    val f = spark.sql(
      s"SELECT count(*) AS n FROM lake.$name WHERE src IS NULL")
    assert(isMetadataAnswered(f))
    assert(f.collect()(0).getLong(0) == 4)
  }

  test("cross-file string MIN/MAX folds in UTF-8 order (round-15 advice)") {
    // one file holds U+FFFD (UTF-8: EF BF BD), the other a
    // supplementary-plane emoji (F0 9F 98 80): Spark's max is the
    // emoji; a UTF-16 code-unit fold (the old Java-String compare)
    // returned the U+FFFD string — a user-visible wrong value under
    // the rule's provably-exact contract
    val root = tmpDir("metaagg-utf8")
    val name = "metaagg_utf8"
    val rows = Seq((1L, "�replacement", "s0"), (2L, "😀emoji", "s1"))
      .toDF("k", "s", "src")
    SnapshotTable.write(spark, root, rows, Seq("src"), statsFor = Seq("s"))
    LakeCatalog.install(spark)
    LakeCatalog.register(spark, name, root)
    val q = spark.sql(s"SELECT min(s) AS mn, max(s) AS mx FROM lake.$name")
    assert(isMetadataAnswered(q), "expected a manifest-only plan:\n" +
      q.queryExecution.optimizedPlan)
    val expect = rows.agg(min($"s"), max($"s")).collect()(0)
    val got = q.collect()(0)
    assert(got.getString(0) == expect.getString(0) &&
      got.getString(1) == expect.getString(1),
      s"manifest fold ($got) diverged from the data scan ($expect)")
    assert(got.getString(1) == "😀emoji")
  }
}
