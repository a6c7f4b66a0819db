package graft.security

import graft.SparkSpec
import graft.ingest.{Crawler, IngestConfig, MockFetcher, Planner, RawWriter}

/** Grant administration round-trip (setup_rbac_permissions.sh:100-147
  * breadth): grants are durable catalog metadata, not code constants. */
class GrantsSpec extends SparkSpec {
  private lazy val table = {
    val root = tmpDir("raw")
    RawWriter.write(spark, Planner.plan(spark, IngestConfig(), "2026-08-11"),
      MockFetcher(), root, tmpDir("quarantine"))
    Crawler.crawl(spark, root, "raw_grants")
    "raw_grants"
  }

  test("grant / list / revoke round-trip, including filter fidelity") {
    assert(Rbac.Grants.list(spark, table).isEmpty)

    Rbac.Grants.grant(spark, table, Rbac.core)
    Rbac.Grants.grant(spark, table, Rbac.pii)
    Rbac.Grants.grant(spark, table, Rbac.masked)

    val listed = Rbac.Grants.list(spark, table)
    assert(listed.map(_.name) == Seq("core", "masked", "pii"))
    // the decoded role is exactly the granted one — row filter (which
    // contains '=' and quotes), column list, and mask list all survive
    assert(Rbac.Grants.roleFor(spark, table, "core").contains(Rbac.core))
    assert(Rbac.Grants.roleFor(spark, table, "masked").contains(Rbac.masked))

    // granted roles are immediately queryable through runAs
    val n = Rbac.runAs(spark, Rbac.core, table,
      s"SELECT COUNT(*) AS n FROM $table").collect()(0).getLong(0)
    assert(n == 10) // core sees only api-a

    Rbac.Grants.revoke(spark, table, "core")
    assert(Rbac.Grants.list(spark, table).map(_.name) == Seq("masked", "pii"))
    // the secured view is gone with the grant
    intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        s"SELECT COUNT(*) AS n FROM $table").collect()
    }
  }

  test("grants are table metadata: a fresh catalog lookup rebuilds the role") {
    Rbac.Grants.grant(spark, table, Rbac.core)
    // simulate a later session: no in-memory state, only catalog metadata
    val rebuilt = Rbac.Grants.roleFor(spark, table, "core").get
    Rbac.createRoleViews(spark, table, Seq(rebuilt))
    val e = Rbac.runAs(spark, rebuilt, table,
      s"SELECT endpoint, COUNT(*) AS n FROM $table GROUP BY endpoint")
      .collect()
    assert(e.map(_.getString(0)).toSeq == Seq("api-a"))
  }
}
