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

  test("a grant on lake.t survives a FRESH session (round 18)") {
    import org.apache.spark.sql.functions._
    // a real lake-catalog table — the V1 catalog has no entry for it,
    // so durability must come from the root's _grants/ registry
    val root = tmpDir("grants-lake") + "/t"
    graft.lake.SnapshotTable.write(spark, root,
      spark.range(40L).select(
        (col("id") % 2).cast("string").as("endpoint"),
        col("id").as("k")),
      Seq("endpoint"))
    graft.lake.LakeCatalog.install(spark)
    graft.lake.LakeCatalog.register(spark, "grants_t", root)
    spark.sql("GRANT SELECT (endpoint, k) ON lake.grants_t TO ROLE lrole " +
      "WHERE endpoint = '0'")
    assert(spark.sql("SHOW GRANTS ON lake.grants_t").collect()
      .map(_.getString(0)).toSeq == Seq("lrole"))
    // enforcement in THIS session
    val role = Rbac.Grants.roleFor(spark, "lake.grants_t", "lrole").get
    assert(Rbac.runAs(spark, role, "lake.grants_t",
      "SELECT count(*) AS n FROM lake.grants_t").collect()(0)
      .getLong(0) == 20L)

    // a FRESH session: no temp views, no session conf — only the root
    // is durable. Re-register the binding, restore from the registry.
    val s2 = spark.newSession()
    graft.lake.LakeCatalog.install(s2)
    graft.lake.LakeCatalog.register(s2, "grants_t", root)
    assert(s2.catalog.tableExists("lake.grants_t") ||
      s2.sql("SELECT count(*) FROM lake.grants_t").collect()(0)
        .getLong(0) == 40L)
    val restored = Rbac.Grants.restoreViews(s2, "lake.grants_t")
    assert(restored.map(_.name) == Seq("lrole"))
    assert(restored.head == role, "grant did not round-trip byte-equal")
    assert(Rbac.runAs(s2, restored.head, "lake.grants_t",
      "SELECT count(*) AS n FROM lake.grants_t").collect()(0)
      .getLong(0) == 20L,
      "fresh-session enforcement differs from the granting session")
    // a traversal-shaped role name must never reach the filesystem
    // (review round 18: revoke deletes `_grants/<name>` by path)
    intercept[IllegalArgumentException] {
      Rbac.Grants.revoke(s2, "lake.grants_t", "../v00000001.manifest")
    }
    // revoke is durable too: a third session sees nothing
    Rbac.Grants.revoke(s2, "lake.grants_t", "lrole")
    val s3 = spark.newSession()
    graft.lake.LakeCatalog.install(s3)
    graft.lake.LakeCatalog.register(s3, "grants_t", root)
    assert(Rbac.Grants.list(s3, "lake.grants_t").isEmpty)
  }
}
