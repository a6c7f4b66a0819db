package graft.queries

import graft.SparkSpec
import graft.ingest._
import graft.security.Rbac

/** The reference's demo SQL through the role-aware runner (E1+I13):
  * same query, different role, different result, per-role output dirs. */
class ReferenceQueriesSpec extends SparkSpec {
  private lazy val setup: String = {
    val root = tmpDir("raw")
    for (d <- Seq("2026-01-11", "2026-01-12"))
      RawWriter.write(spark, Planner.plan(spark, IngestConfig(), d),
        MockFetcher(), root, tmpDir("q"))
    Crawler.crawl(spark, root, "raw_refq")
    Rbac.createRoleViews(spark, "raw_refq")
    "raw_refq"
  }

  test("smoke query returns 8 partitions of 10 files (2 dates x 4 endpoints)") {
    val rows = spark.sql(ReferenceQueries.smokeFilesPerPartition(setup)).collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getLong(2) == 10L))
    // ORDER BY ingestion_date DESC: newest date first
    assert(rows.head.getString(1) == "2026-01-12")
  }

  test("sample rows show cardinality 5; dialect shim handles today filter") {
    val rows = spark.sql(ReferenceQueries.sampleRows(setup)).collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getAs[Number]("item_count").longValue == 5L))
    // today's filter: translated pattern parses + prunes (0 rows: no data today)
    assert(spark.sql(ReferenceQueries.todaysPages(setup)).count() == 0)
  }

  test("query runner: per-role results land in per-role prefixes") {
    val out = tmpDir("results")
    val core = QueryRunner.run(spark, Rbac.core, setup, "total",
      ReferenceQueries.totalRecords(setup), out)
    val pii = QueryRunner.run(spark, Rbac.pii, setup, "total",
      ReferenceQueries.totalRecords(setup), out)
    assert(core.collect()(0).getLong(0) == 20L)
    assert(pii.collect()(0).getLong(0) == 80L)
    assert(new java.io.File(s"$out/core/total").exists())
    assert(new java.io.File(s"$out/pii/total").exists())
    // written results round-trip
    assert(spark.read.parquet(s"$out/pii/total").collect()(0).getLong(0) == 80L)
  }

  test("string-results mode mirrors Athena's all-VarCharValue result model") {
    val out = tmpDir("results_str")
    QueryRunner.run(spark, Rbac.core, setup, "by_endpoint",
      ReferenceQueries.filesByEndpoint(setup), out, stringResults = true)
    val written = spark.read.parquet(s"$out/core/by_endpoint")
    // every cell a string, like comprehensive_rbac_demo.py:50-56 sees
    assert(written.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    val rows = written.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("api-a"))
    assert(rows(0).getString(1) == "20")
  }

  test("vec_dot / vec_cosine / vec_qdot are SQL-callable after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
                vec_qdot(array(1L, -2L), array(3L, 4L)) AS q""")
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getLong(2) == -5L)
  }
}
