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

  // ---- round-3 advisory bypasses: CTE shadowing must be SCOPED ----

  test("a non-recursive CTE cannot shadow the table inside its own definition") {
    // the inner reference resolves to the catalog table → must be secured;
    // the outer reference then reads the (secured) CTE
    assert(coreCount(
      s"""WITH $table AS (SELECT * FROM $table)
          SELECT COUNT(*) AS n FROM $table""") == 10)
  }

  test("a CTE inside a derived table does not shadow references outside it") {
    assert(coreCount(
      s"""SELECT COUNT(*) AS n FROM $table CROSS JOIN
          (WITH $table AS (SELECT 1 AS one) SELECT * FROM $table) z""") == 10)
  }

  test("CTE visibility flows into later definitions of the same WITH clause") {
    assert(coreCount(
      s"""WITH a AS (SELECT endpoint FROM $table),
               b AS (SELECT * FROM a)
          SELECT COUNT(*) AS n FROM b""") == 10)
  }

  test("statements are rejected: runAs is a query-only entry point") {
    // metadata command: would resolve via UnresolvedTableOrView and leak
    // partition values / storage location outside the row filter
    val show = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table, s"SHOW PARTITIONS $table").collect()
    }
    assert(show.getMessage.contains("only queries"))
    // DML: would execute eagerly on Dataset construction
    val ins = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        s"INSERT INTO scratch_t SELECT * FROM $table").collect()
    }
    assert(ins.getMessage.contains("only queries"))
    val desc = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table, s"DESCRIBE EXTENDED $table").collect()
    }
    assert(desc.getMessage.contains("only queries"))
  }

  test("file-path relations cannot read the protected data under runAs") {
    // discover the table's storage location the way an attacker would not
    // be able to (DESCRIBE is denied above) — directly from the catalog
    val loc = spark.sql(s"DESCRIBE EXTENDED $table").collect()
      .find(_.getString(0) == "Location").map(_.getString(1)).get
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        s"SELECT COUNT(*) AS n FROM json.`$loc`").collect()
    }
    // fails closed at parse time — structurally, not via a conf flip
    assert(e.getMessage.contains("file-path relations"))
    // ... and for any OTHER path too (path reads have no catalog identity
    // to attribute, so runAs denies them wholesale)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        "SELECT COUNT(*) AS n FROM parquet.`/etc/hosts`").collect()
    }
    assert(e2.getMessage.contains("file-path relations"))
    // a dotted datasource CLASS name does not dodge the token list
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        s"SELECT COUNT(*) AS n FROM " +
          s"`org.apache.spark.sql.execution.datasources.json`.`$loc`").collect()
    }
    assert(e3.getMessage.contains("file-path relations"))
  }

  test("a temp view over the raw storage path is denied by the backstop") {
    // the advisory's bypass: the caller reads the table's files directly
    // (no catalogTable anywhere in that plan) and wraps them in a view —
    // the parse-level check never sees a path, so the structural
    // no-catalog-identity rule in the backstop must deny it
    val loc = spark.sql(s"DESCRIBE EXTENDED $table").collect()
      .find(_.getString(0) == "Location").map(_.getString(1)).get
    spark.read.json(loc.stripPrefix("file:"))
      .createOrReplaceTempView("path_leak")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        "SELECT COUNT(*) AS n FROM path_leak").collect()
    }
    assert(e.getMessage.contains("access denied"))
  }

  test("runAs mutates no session conf and is safe under concurrency") {
    val before = spark.conf.get("spark.sql.runSQLOnFiles", "true")
    // 4 threads × 8 calls: with the old runSQLOnFiles set/restore this
    // interleaving raced (one finally restoring while another's analysis
    // was in flight); structurally-fail-closed runAs shares no state
    val results = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ok = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map { _ =>
      new Thread(() => (1 to 8).foreach { _ =>
        // catch INSIDE the loop: an uncaught throw would kill the thread
        // silently and the surviving threads' successes could still
        // satisfy a naive results-only assertion
        try {
          results.add(coreCount(s"SELECT COUNT(*) AS n FROM $table"))
          ok.incrementAndGet()
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.isEmpty,
      s"concurrent runAs threw: ${Option(failures.peek()).map(_.toString)}")
    assert(ok.get == 32 && results.size == 1 && results.contains(10L))
    assert(spark.conf.get("spark.sql.runSQLOnFiles", "true") == before)
  }

  test("a CTE named like the role view is rejected, not silently captured") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        s"""WITH ${Rbac.viewName(table, Rbac.core)} AS (SELECT 1 AS one)
            SELECT COUNT(*) AS n FROM $table""").collect()
    }
    assert(e.getMessage.contains("conflicts with the role view"))
  }

  test("EXECUTE IMMEDIATE is rejected (nested SQL parses after the rewrite)") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        s"EXECUTE IMMEDIATE 'SELECT COUNT(*) AS n FROM $table'").collect()
    }
    assert(e.getMessage.contains("EXECUTE IMMEDIATE"))
  }

  test("a view wrapping the protected table cannot smuggle it past runAs") {
    // the view body references the base table; it expands during analysis,
    // AFTER the parse-level rewrite — the post-analysis backstop must deny
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW leak_view AS SELECT * FROM $table")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        "SELECT COUNT(*) AS n FROM leak_view").collect()
    }
    assert(e.getMessage.contains("access denied"))
    // ... while the role's own view keeps working (same analyzed subtree,
    // reached through the sanctioned alias)
    assert(coreCount(s"SELECT COUNT(*) AS n FROM $table") == 10)
  }

  test("backstop does not over-deny: self-join, union and subquery shapes run") {
    // every shape below reaches the base table ONLY through the role view
    // (possibly several instances of it) — all must be allowed
    assert(coreCount(
      s"""SELECT COUNT(*) AS n
          FROM $table a JOIN $table b ON a.page = b.page""") == 10)
    assert(coreCount(
      s"SELECT COUNT(*) AS n FROM (SELECT * FROM $table UNION ALL SELECT * FROM $table)") == 20)
    assert(coreCount(
      s"""SELECT COUNT(*) AS n FROM $table
          WHERE page <= (SELECT MAX(page) FROM $table)""") == 10)
  }

  test("aliasing a leaking relation as the role-view name does not fool the backstop") {
    // the sanctioned subtree is matched structurally (canonicalized plan),
    // so wearing the role view's predictable NAME buys nothing
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW leak_view2 AS SELECT * FROM $table")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        s"""SELECT COUNT(*) AS n
            FROM leak_view2 AS ${Rbac.viewName(table, Rbac.core)}""").collect()
    }
    assert(e.getMessage.contains("access denied"))
  }

  test("IDENTIFIER() hidden inside a CTE definition is rejected too") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        s"""WITH x AS (SELECT * FROM IDENTIFIER('$table'))
            SELECT COUNT(*) AS n FROM x""").collect()
    }
    assert(e.getMessage.contains("IDENTIFIER"))
  }

  test("IDENTIFIER() late binding is rejected, not silently bypassed") {
    // IDENTIFIER('t') resolves during analysis, after the substitution
    // seam — allowing it would be a full RBAC bypass, so runAs fails closed
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        s"SELECT COUNT(*) AS n FROM IDENTIFIER('$table')").collect()
    }
    assert(e.getMessage.contains("IDENTIFIER"))
    // expression position too (nested inside a subquery expression)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, table,
        s"SELECT (SELECT COUNT(*) FROM IDENTIFIER('$table')) AS n").collect()
    }
    assert(e2.getMessage.contains("IDENTIFIER"))
  }

  // ---- round-3 advisory: namespace matching must use the session state ----

  test("a qualified protected name matches an unqualified reference") {
    val df = org.apache.spark.sql.graft.SqlRewrite.substituteTable(
      spark, s"SELECT COUNT(*) AS n FROM $table",
      s"default.$table", Rbac.viewName(table, Rbac.core))
    assert(df.collect()(0).getLong(0) == 10)
  }

  test("a protected table in a non-default database is rewritten") {
    spark.sql("CREATE DATABASE IF NOT EXISTS secdb")
    spark.sql(s"CREATE OR REPLACE VIEW secdb.prot AS SELECT * FROM $table")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW prot_core AS
         SELECT * FROM secdb.prot WHERE endpoint = 'api-a'""")
    // qualified reference while the current database is default
    val q = org.apache.spark.sql.graft.SqlRewrite.substituteTable(
      spark, "SELECT COUNT(*) AS n FROM secdb.prot", "secdb.prot", "prot_core")
    assert(q.collect()(0).getLong(0) == 10)
    // unqualified reference once the current database IS secdb
    spark.catalog.setCurrentDatabase("secdb")
    try {
      val u = org.apache.spark.sql.graft.SqlRewrite.substituteTable(
        spark, "SELECT COUNT(*) AS n FROM prot", "secdb.prot", "prot_core")
      assert(u.collect()(0).getLong(0) == 10)
    } finally spark.catalog.setCurrentDatabase("default")
  }

  // --- RBAC over LAKE tables (round-12 verdict item 3): the rewrite
  // protects a SnapshotTable by its catalog name, because LakeCatalog
  // gives it one — before the catalog existed, runAs could not govern
  // the lakehouse layer at all.
  private lazy val lakeTable: String = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = tmpDir("rbac-lake")
    graft.lake.SnapshotTable.write(spark, root,
      spark.range(100L).select(
        concat(lit("api-"), when($"id" % 5 === 0, "a").otherwise("b"))
          .as("endpoint"),
        $"id".as("k"), ($"id" * 3).as("payload")),
      Seq("endpoint"))
    graft.lake.LakeCatalog.install(spark)
    graft.lake.LakeCatalog.register(spark, "snap_rbac", root)
    val t = "lake.snap_rbac"
    Rbac.createRoleViews(spark, t, Seq(
      Rbac.Role("core", Some("endpoint = 'api-a'"),
        Some(Seq("endpoint", "k"))),
      Rbac.Role("pii", None, None)))
    t
  }

  test("a lake (SnapshotTable) table is protected by catalog name") {
    val core = Rbac.runAs(spark,
      Rbac.Role("core", Some("endpoint = 'api-a'"),
        Some(Seq("endpoint", "k"))),
      lakeTable, s"SELECT COUNT(*) AS n FROM $lakeTable")
    assert(core.collect()(0).getLong(0) == 20,
      "core must see only the api-a rows of the lake table")
    val pii = Rbac.runAs(spark, Rbac.pii, lakeTable,
      s"SELECT COUNT(*) AS n FROM $lakeTable")
    assert(pii.collect()(0).getLong(0) == 100)
  }

  test("metadata-only COUNT composes with the role's row filter") {
    // The fixture role's filter is a PARTITION-column predicate, so
    // [[graft.lake.MetadataAggregate]] may answer the count from the
    // manifest — WITH the filter applied over the partition tuples
    // (LF semantics: the filter applies to every query, including
    // metadata-answered ones). A role filter on a DATA column fails
    // the partition-only reference check and takes the (role-filtered)
    // scan instead — both shapes pinned here.
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
    def metadataAnswered(df: org.apache.spark.sql.DataFrame): Boolean = {
      val p = df.queryExecution.optimizedPlan
      p.collectFirst { case s: DataSourceV2ScanRelation => s }.isEmpty &&
        p.collectFirst { case r: DataSourceV2Relation => r }.isEmpty &&
        p.collectFirst { case l: LocalRelation => l }.nonEmpty
    }
    val core = Rbac.runAs(spark,
      Rbac.Role("core", Some("endpoint = 'api-a'"),
        Some(Seq("endpoint", "k"))),
      lakeTable, s"SELECT COUNT(*) AS n FROM $lakeTable")
    assert(metadataAnswered(core),
      "partition-column role filter: the count must answer from the " +
        s"manifest\n${core.queryExecution.optimizedPlan}")
    assert(core.collect()(0).getLong(0) == 20,
      "the metadata answer must still be the ROLE's count, not the " +
        "table's")
    val core2 =
      Rbac.Role("core2", Some("k % 2 = 0"), Some(Seq("endpoint", "k")))
    Rbac.createRoleViews(spark, lakeTable, Seq(core2))
    val dataFiltered = Rbac.runAs(spark, core2,
      lakeTable, s"SELECT COUNT(*) AS n FROM $lakeTable")
    assert(!metadataAnswered(dataFiltered),
      "data-column role filter must take the scan")
    assert(dataFiltered.collect()(0).getLong(0) == 50)
  }

  test("lake-table column denial fails loudly, like the reference demo") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark,
        Rbac.Role("core", Some("endpoint = 'api-a'"),
          Some(Seq("endpoint", "k"))),
        lakeTable,
        s"SELECT payload FROM $lakeTable").collect()
    }
    assert(e.getMessage.contains("payload"))
  }

  test("time travel on a protected table is denied under runAs") {
    // Pinned policy (round-14 verdict item 4): the role view is defined
    // over the LIVE table; a VERSION AS OF read reaches table state the
    // filter was never applied to, so it fails closed instead of
    // silently serving historical rows.
    val role = Rbac.Role("core", Some("endpoint = 'api-a'"),
      Some(Seq("endpoint", "k")))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, role, lakeTable,
        s"SELECT COUNT(*) AS n FROM $lakeTable VERSION AS OF 1").collect()
    }
    assert(e != null)
    // the same read outside runAs is fine (time travel itself works)
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM $lakeTable VERSION AS OF 1")
      .collect()(0).getLong(0) == 100)
  }

  test("history/restore/maintenance statements are rejected under " +
      "runAs and execute NOTHING (round-15 verdict item 7)") {
    // Pinned policy, on purpose: DESCRIBE HISTORY serves version
    // metadata (partition counts per commit, commit clock) the role's
    // row filter never applied to, and RESTORE/VACUUM/OPTIMIZE would
    // MUTATE through a query door — runAs refuses all of them as
    // statements, before anything executes. The surfaces stay fully
    // available outside runAs; governance here is refusal, not
    // filtering, because half-filtered history metadata would imply a
    // coverage the row filter cannot give.
    val t = lakeTable
    val (root, _) = graft.lake.LakeCatalog.resolveBinding(spark, t)
    val before = graft.lake.SnapshotTable.versions(spark, root)
    val role = Rbac.Role("core", Some("endpoint = 'api-a'"),
      Some(Seq("endpoint", "k")))
    Seq(s"DESCRIBE HISTORY $t",
        s"RESTORE TABLE $t TO VERSION AS OF 1",
        s"VACUUM $t RETAIN 1 VERSIONS",
        s"OPTIMIZE $t").foreach { stmt =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        Rbac.runAs(spark, role, t, stmt).collect()
      }
      assert(e.getMessage.contains("only queries"),
        s"$stmt: ${e.getMessage}")
    }
    assert(graft.lake.SnapshotTable.versions(spark, root) == before,
      "a rejected statement must not have committed or vacuumed")
    // outside runAs the same surfaces serve — role-scoped refusal, not
    // a feature removal
    assert(spark.sql(s"DESCRIBE HISTORY $t").count() >= 1)
  }

  test("the change-feed TVF is denied under runAs; secureFeed is the " +
      "sanctioned composition") {
    lakeTable // force registration of the binding + catalog
    val role = Rbac.Role("core", Some("endpoint = 'api-a'"),
      Some(Seq("endpoint", "k")))
    // table_changes resolves to a path-backed scan with no catalog
    // identity — runAs's structural backstop fails closed, so the
    // protected table's history and delete preimages cannot leak
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, role, lakeTable,
        "SELECT COUNT(*) AS n FROM table_changes('snap_rbac', 0)")
        .collect()
    }
    assert(e.getMessage.contains("access denied") ||
      e.getMessage.contains("catalog"), e.getMessage)
    // sanctioned: compose the role onto feed rows — the row filter
    // applies to EVERY change row (LF semantics extended to CDC), so a
    // filtered-out row's delete preimage never surfaces
    import org.apache.spark.sql.functions._
    val root = tmpDir("rbac-feed")
    graft.lake.SnapshotTable.write(spark, root,
      spark.range(10L).select(
        concat(lit("api-"),
          when(col("id") % 5 === 0, "a").otherwise("b")).as("endpoint"),
        col("id").as("k"), (col("id") * 3).as("payload")),
      Seq("endpoint"))
    graft.lake.SnapshotTable.deleteWhere(spark, root,
      col("k") === 0 || col("k") === 1, Seq("endpoint"))
    val feed = graft.lake.ChangeFeed.between(spark, root, 0)
    val secured = Rbac.secureFeed(feed, role)
    assert(secured.columns.toSeq ==
      Seq("endpoint", "k", graft.lake.ChangeFeed.ChangeTypeCol,
        graft.lake.ChangeFeed.VersionCol),
      "the secured feed keeps its metadata columns, drops denied ones")
    val deletes = secured.filter(col(graft.lake.ChangeFeed.ChangeTypeCol)
      === graft.lake.ChangeFeed.Delete).collect()
    assert(deletes.map(_.getLong(1)).toSet == Set(0L),
      "only the api-a delete preimage (k=0) may surface; k=1 is api-b")
    assert(secured.count() == 2 + 1,
      "2 bootstrap inserts (k=0,5) + 1 visible delete (k=0)")
    // a role whose explicit column grant already names a feed meta
    // column must not produce a duplicate (ambiguous) output column
    val metaRole = Rbac.Role("core", Some("endpoint = 'api-a'"),
      Some(Seq("endpoint", "k", graft.lake.ChangeFeed.ChangeTypeCol)))
    val securedMeta = Rbac.secureFeed(feed, metaRole)
    assert(securedMeta.columns.toSeq ==
      Seq("endpoint", "k", graft.lake.ChangeFeed.ChangeTypeCol,
        graft.lake.ChangeFeed.VersionCol),
      s"duplicate meta column: ${securedMeta.columns.mkString(",")}")
    // the reference is unambiguous downstream
    assert(securedMeta.filter(col(graft.lake.ChangeFeed.ChangeTypeCol)
      === graft.lake.ChangeFeed.Delete).count() == 1)
  }

  test("a view smuggling the lake table past runAs is denied") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW lake_smuggle AS
      SELECT * FROM $lakeTable""")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark,
        Rbac.Role("core", Some("endpoint = 'api-a'"),
          Some(Seq("endpoint", "k"))),
        lakeTable, "SELECT COUNT(*) AS n FROM lake_smuggle").collect()
    }
    assert(e.getMessage.contains("access denied") ||
      e.getMessage.contains("protected"),
      s"smuggled lake view must be denied: ${e.getMessage}")
  }

  // ---- SQL GRANT / REVOKE front door (round-16 verdict item 6) -------

  test("GRANT/REVOKE/SHOW GRANTS drive the rbac scenario purely from SQL") {
    val t = table
    // a row filter + column set declared as a statement (the
    // setup_rbac_permissions.sh grant, spelled in SQL)
    spark.sql(s"GRANT SELECT (endpoint, date, page) ON $t " +
      "TO ROLE sqlcore WHERE endpoint = 'api-a'")
    spark.sql(s"GRANT SELECT ON $t TO ROLE sqlmask MASK (fetched_at)")
    // identical query, different results by role — the
    // comprehensive_rbac_demo contract with zero API calls
    val all = spark.sql(s"SELECT COUNT(*) AS n FROM $t")
      .collect()(0).getLong(0)
    val core2 = Rbac.Grants.roleFor(spark, t, "sqlcore").get
    val coreN = Rbac.runAs(spark, core2, t,
      s"SELECT COUNT(*) AS n FROM $t").collect()(0).getLong(0)
    assert(all == 40 && coreN == 10, s"all=$all core=$coreN")
    // denied column fails loudly at analysis, like the reference demo
    intercept[Exception] {
      Rbac.runAs(spark, core2, t,
        s"SELECT fetched_at FROM $t").collect()
    }
    // the masking grant returns digests, not cleartext
    val m = Rbac.Grants.roleFor(spark, t, "sqlmask").get
    val masked = Rbac.runAs(spark, m, t,
      s"SELECT fetched_at FROM $t LIMIT 1").collect()(0).getString(0)
    assert(masked.matches("[0-9a-f]{32}"), s"not masked: $masked")
    // SHOW GRANTS lists the durable permission plane
    val rows = spark.sql(s"SHOW GRANTS ON $t").collect()
    val sc = rows.find(_.getString(0) == "sqlcore").get
    assert(sc.getString(1) == "endpoint,date,page")
    assert(sc.getString(3) == "endpoint = 'api-a'")
    assert(rows.find(_.getString(0) == "sqlmask").get
      .getString(2) == "fetched_at")
    // REVOKE restores: grant gone, secured view gone
    spark.sql(s"REVOKE ALL ON $t FROM ROLE sqlcore")
    assert(Rbac.Grants.roleFor(spark, t, "sqlcore").isEmpty)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM ${t}_sqlcore").collect()
    }
    assert(!spark.sql(s"SHOW GRANTS ON $t").collect()
      .exists(_.getString(0) == "sqlcore"))
  }

  test("GRANT validates at declaration and is refused under runAs") {
    val t = table
    // unknown granted column
    val e1 = intercept[Exception] { spark.sql(
      s"GRANT SELECT (nope) ON $t TO ROLE g1") }
    assert(e1.getMessage.contains("not in the table"), e1.getMessage)
    // unparseable filter
    val e2 = intercept[Exception] { spark.sql(
      s"GRANT SELECT ON $t TO ROLE g2 WHERE endpoint === ") }
    assert(e2.getMessage.contains("does not parse"), e2.getMessage)
    // filter over an unknown column
    val e3 = intercept[Exception] { spark.sql(
      s"GRANT SELECT ON $t TO ROLE g3 WHERE nope = 1") }
    assert(e3.getMessage.contains("unknown column"), e3.getMessage)
    // a mask outside the granted column list is dead — refused
    val e4 = intercept[Exception] { spark.sql(
      s"GRANT SELECT (endpoint) ON $t TO ROLE g4 MASK (fetched_at)") }
    assert(e4.getMessage.contains("granted column list"), e4.getMessage)
    // the permission plane cannot be rewritten FROM INSIDE a role:
    // GRANT/REVOKE are statements, and runAs allows only queries
    spark.sql(s"GRANT SELECT ON $t TO ROLE g5")
    val g5 = Rbac.Grants.roleFor(spark, t, "g5").get
    val e5 = intercept[Exception] {
      Rbac.runAs(spark, g5, t,
        s"GRANT SELECT ON $t TO ROLE evil").collect()
    }
    assert(e5.getMessage.contains("only queries"), e5.getMessage)
    val e6 = intercept[Exception] {
      Rbac.runAs(spark, g5, t,
        s"REVOKE ALL ON $t FROM ROLE g5").collect()
    }
    assert(e6.getMessage.contains("only queries"), e6.getMessage)
    spark.sql(s"REVOKE ALL ON $t FROM ROLE g5")
  }
}
