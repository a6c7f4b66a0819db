package graft.security

import graft.SparkSpec
import graft.ingest.{Crawler, IngestConfig, MockFetcher, Planner, RawWriter}

/** `Rbac.runAs` must substitute the protected table at the *plan* level:
  * the round-1/2 verdicts flagged the old textual replace as a security
  * bypass (case variants / qualified names slip through to the base table;
  * substring and literal collisions corrupt unrelated SQL). Each case here
  * pins one of those failure modes. */
class RbacRewriteSpec extends SparkSpec {
  private lazy val table = {
    val root = tmpDir("raw")
    RawWriter.write(spark, Planner.plan(spark, IngestConfig(), "2026-08-11"),
      MockFetcher(), root, tmpDir("quarantine"))
    Crawler.crawl(spark, root, "raw_rewrite")
    Rbac.createRoleViews(spark, "raw_rewrite")
    "raw_rewrite"
  }

  // core sees only endpoint='api-a': 10 of 40 pages
  private def coreCount(sql: String): Long =
    Rbac.runAs(spark, Rbac.core, table, sql).collect()(0).getLong(0)

  test("table name inside a string literal is not rewritten") {
    // the literal 'raw_rewrite' must survive; the relation must not
    assert(coreCount(
      s"SELECT COUNT(*) AS n FROM $table WHERE endpoint <> 'raw_rewrite'") == 10)
    // and the literal really is compared verbatim: equality matches nothing
    assert(coreCount(
      s"SELECT COUNT(*) AS n FROM $table WHERE endpoint = 'raw_rewrite'") == 0)
  }

  test("identifiers containing the table name as a substring are untouched") {
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW ${table}_audit AS SELECT 'x' AS tag")
    // the secured table is filtered to 10 rows; the sibling view keeps its
    // own identity (a textual replace would mangle `raw_rewrite_audit`)
    val df = Rbac.runAs(spark, Rbac.core, table,
      s"SELECT COUNT(*) AS n FROM $table CROSS JOIN ${table}_audit")
    assert(df.collect()(0).getLong(0) == 10)
  }

  test("case-insensitive and qualified references are rewritten") {
    assert(coreCount(s"SELECT COUNT(*) AS n FROM ${table.toUpperCase}") == 10)
    assert(coreCount(s"SELECT COUNT(*) AS n FROM default.$table") == 10)
    assert(coreCount(
      s"SELECT COUNT(*) AS n FROM spark_catalog.default.$table") == 10)
  }

  test("subqueries and CTE bodies are rewritten too") {
    assert(coreCount(
      s"""SELECT COUNT(*) AS n FROM (SELECT endpoint FROM $table) s""") == 10)
    assert(coreCount(
      s"""WITH pages AS (SELECT endpoint FROM $table)
          SELECT COUNT(*) AS n FROM pages""") == 10)
    // scalar subquery position
    assert(coreCount(
      s"SELECT (SELECT COUNT(*) FROM $table) AS n") == 10)
  }

  test("a CTE shadowing the table name wins over the catalog table") {
    assert(coreCount(
      s"""WITH $table AS (SELECT 1 AS one)
          SELECT COUNT(*) AS n FROM $table""") == 1)
  }
}
