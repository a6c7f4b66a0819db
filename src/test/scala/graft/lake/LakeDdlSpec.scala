package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL DDL on the lake catalog (round 16): CREATE TABLE / CTAS mint an
  * empty governed [[SnapshotTable]] root and self-register the binding
  * — the front door that makes the whole surface reachable without the
  * Scala API — DROP unbinds (PURGE deletes), RENAME rebinds, and every
  * refusal is loud and specific. */
class LakeDdlSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): (String, String) = {
    n += 1
    LakeCatalog.install(spark)
    (s"ddl_$n", tmpDir(s"lakeddl-$n") + s"/t$n")
  }

  test("CREATE -> INSERT -> MERGE -> SELECT purely in SQL") {
    val (name, root) = fresh()
    spark.sql(s"""
      CREATE TABLE lake.$name (k BIGINT, v STRING, src STRING)
      PARTITIONED BY (src) LOCATION '$root'
      TBLPROPERTIES ('rowkey' = 'k', 'statsfor' = 'k', 'clusterby' = 'k')""")
    // v1 = the empty table, with every declaration recorded
    assert(SnapshotTable.versions(spark, root) == Seq(1))
    assert(SnapshotTable.partitionColumns(spark, root) == Seq("src"))
    assert(SnapshotTable.rowKey(spark, root).contains("k"))
    assert(SnapshotTable.declaredColumns(spark, root) == (Seq("k"), Seq("k")))
    assert(spark.sql(s"SELECT count(*) AS n FROM lake.$name")
      .collect()(0).getLong(0) == 0L)
    assert(spark.sql("SHOW TABLES IN lake").collect()
      .map(_.getString(1)).contains(name))
    // first data lands through plain SQL INSERT
    spark.sql(s"INSERT INTO lake.$name VALUES " +
      "(1, 'a', 's0'), (2, 'b', 's0'), (3, 'c', 's1')")
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2))
    // MERGE works off the DDL-declared row key — no API call ever ran
    Seq((2L, "b2", "s0", "u"), (3L, "", "s1", "d"), (9L, "z", "s1", "i"))
      .toDF("k", "v", "src", "op").createOrReplaceTempView("ddl_changes")
    spark.sql(s"""
      MERGE INTO lake.$name t USING ddl_changes s ON t.k = s.k
      WHEN MATCHED AND s.op = 'd' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v, src) VALUES (s.k, s.v, s.src)""")
    val live = spark.sql(s"SELECT k, v, src FROM lake.$name ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(live.toSeq == Seq((1L, "a", "s0"), (2L, "b2", "s0"),
      (9L, "z", "s1")))
    // time travel reaches the DDL-born v1 (empty) and the INSERT's v2
    assert(spark.sql(s"SELECT count(*) FROM lake.$name VERSION AS OF 1")
      .collect()(0).getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM lake.$name VERSION AS OF 2")
      .collect()(0).getLong(0) == 3L)
    assert(spark.sql(s"DESCRIBE HISTORY lake.$name").count() == 3L)
  }

  test("CTAS creates, declares, and loads in one statement") {
    val (name, root) = fresh()
    spark.range(20L)
      .select(col("id").as("k"), (col("id") % 3).cast("string").as("src"))
      .createOrReplaceTempView("ddl_ctas_src")
    spark.sql(s"""
      CREATE TABLE lake.$name PARTITIONED BY (src) LOCATION '$root'
      TBLPROPERTIES ('rowkey' = 'k')
      AS SELECT * FROM ddl_ctas_src""")
    // v1 = empty create, v2 = the query's rows through the same V1
    // write path as INSERT INTO
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2))
    assert(spark.sql(s"SELECT count(*) FROM lake.$name")
      .collect()(0).getLong(0) == 20L)
    assert(SnapshotTable.rowKey(spark, root).contains("k"))
    assert(SnapshotTable.entriesFor(spark, root, 2).map(_._1).sorted ==
      Seq("0", "1", "2"))
  }

  test("CREATE refusals are loud and specific") {
    val (name, root) = fresh()
    // no partitioning
    val e1 = intercept[Exception] { spark.sql(
      s"CREATE TABLE lake.${name}_p (k BIGINT) LOCATION '$root'") }
    assert(e1.getMessage.contains("PARTITIONED BY"), e1.getMessage)
    // unknown property (a typo'd declaration must not silently drop)
    val e2 = intercept[Exception] { spark.sql(
      s"CREATE TABLE lake.${name}_q (k BIGINT, src STRING) " +
        s"PARTITIONED BY (src) LOCATION '$root' " +
        "TBLPROPERTIES ('rowKeyy' = 'k')") }
    assert(e2.getMessage.contains("rowkeyy") ||
      e2.getMessage.contains("rowKeyy"), e2.getMessage)
    // foreign storage format
    val e3 = intercept[Exception] { spark.sql(
      s"CREATE TABLE lake.${name}_r (k BIGINT, src STRING) USING csv " +
        s"PARTITIONED BY (src) LOCATION '$root'") }
    assert(e3.getMessage.contains("parquet"), e3.getMessage)
    // duplicate name
    spark.sql(s"CREATE TABLE lake.$name (k BIGINT, src STRING) " +
      s"PARTITIONED BY (src) LOCATION '$root'")
    val e4 = intercept[Exception] { spark.sql(
      s"CREATE TABLE lake.$name (k BIGINT, src STRING) " +
        s"PARTITIONED BY (src) LOCATION '${root}_other'") }
    assert(e4.getMessage.toLowerCase.contains("already exists"),
      e4.getMessage)
    // adopting an existing root under a fresh declaration set
    spark.sql(s"DROP TABLE lake.$name")
    val e5 = intercept[Exception] { spark.sql(
      s"CREATE TABLE lake.$name (k BIGINT, src STRING) " +
        s"PARTITIONED BY (src) LOCATION '$root'") }
    assert(e5.getMessage.contains("register"), e5.getMessage)
    // no LOCATION and no warehouse conf
    val e6 = intercept[Exception] { spark.sql(
      s"CREATE TABLE lake.${name}_w (k BIGINT, src STRING) " +
        "PARTITIONED BY (src)") }
    assert(e6.getMessage.contains("warehouse"), e6.getMessage)
  }

  test("the catalog warehouse conf supplies the root when LOCATION " +
      "is omitted") {
    val (name, _) = fresh()
    val wh = tmpDir("lakeddl-wh")
    spark.conf.set("spark.sql.catalog.lake.warehouse", wh)
    try {
      spark.sql(s"CREATE TABLE lake.$name (k BIGINT, src STRING) " +
        "PARTITIONED BY (src)")
      val (root, _) = LakeCatalog.resolveBinding(spark, name)
      assert(root == new org.apache.hadoop.fs.Path(wh, name).toString)
      assert(SnapshotTable.versions(spark, root) == Seq(1))
    } finally spark.conf.unset("spark.sql.catalog.lake.warehouse")
  }

  test("DROP unbinds and keeps data; re-register restores; PURGE deletes") {
    val (name, root) = fresh()
    spark.sql(s"CREATE TABLE lake.$name (k BIGINT, src STRING) " +
      s"PARTITIONED BY (src) LOCATION '$root'")
    spark.sql(s"INSERT INTO lake.$name VALUES (1, 's0')")
    spark.sql(s"DROP TABLE lake.$name")
    intercept[Exception] { spark.sql(s"SELECT * FROM lake.$name").collect() }
    // external-table semantics: the versioned root survives the DROP
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2))
    LakeCatalog.register(spark, name, root)
    assert(spark.sql(s"SELECT count(*) FROM lake.$name")
      .collect()(0).getLong(0) == 1L)
    // PURGE is the destructive spelling
    spark.sql(s"DROP TABLE lake.$name PURGE")
    assert(!new java.io.File(root).exists(), "PURGE must delete the root")
  }

  test("PURGE refuses pinned bindings and aliased roots") {
    val (name, root) = fresh()
    spark.sql(s"CREATE TABLE lake.$name (k BIGINT, src STRING) " +
      s"PARTITIONED BY (src) LOCATION '$root'")
    // an alias binding serving the same root blocks the purge
    LakeCatalog.register(spark, s"${name}_alias", root)
    val e1 = intercept[Exception] { spark.sql(s"DROP TABLE lake.$name PURGE") }
    assert(e1.getMessage.contains("_alias"), e1.getMessage)
    spark.sql(s"DROP TABLE lake.${name}_alias")
    // a pinned binding names a deliberately-held historical state
    LakeCatalog.register(spark, name, root, version = Some(1))
    val e2 = intercept[Exception] { spark.sql(s"DROP TABLE lake.$name PURGE") }
    assert(e2.getMessage.contains("pins"), e2.getMessage)
    assert(new java.io.File(root).exists(),
      "refused PURGE must not have deleted anything")
    spark.sql(s"DROP TABLE lake.$name")
  }

  test("ALTER TABLE RENAME TO rebinds; history and data untouched") {
    val (name, root) = fresh()
    spark.sql(s"CREATE TABLE lake.$name (k BIGINT, src STRING) " +
      s"PARTITIONED BY (src) LOCATION '$root'")
    spark.sql(s"INSERT INTO lake.$name VALUES (7, 's0')")
    spark.sql(s"ALTER TABLE lake.$name RENAME TO lake.${name}_renamed")
    intercept[Exception] { spark.sql(s"SELECT * FROM lake.$name").collect() }
    assert(spark.sql(s"SELECT k FROM lake.${name}_renamed")
      .collect()(0).getLong(0) == 7L)
    assert(spark.sql(
      s"SELECT count(*) FROM lake.${name}_renamed VERSION AS OF 1")
      .collect()(0).getLong(0) == 0L)
    // renaming onto an existing name refuses
    val (other, otherRoot) = fresh()
    spark.sql(s"CREATE TABLE lake.$other (k BIGINT, src STRING) " +
      s"PARTITIONED BY (src) LOCATION '$otherRoot'")
    val e = intercept[Exception] { spark.sql(
      s"ALTER TABLE lake.${name}_renamed RENAME TO lake.$other") }
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
  }
}
