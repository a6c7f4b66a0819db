package graft.security

import graft.SparkSpec
import graft.ingest._

/** Plan-level row security: identical query text, per-role results, no
  * views involved — the filter is injected into the logical plan. */
class RowFilterRuleSpec extends SparkSpec {
  test("optimizer rule filters the protected table for the core role") {
    val root = tmpDir("raw")
    RawWriter.write(spark, Planner.plan(spark, IngestConfig(), "2026-02-01"),
      MockFetcher(), root, tmpDir("q"))
    Crawler.crawl(spark, root, "raw_rule")

    spark.experimental.extraOptimizations ++=
      Seq(org.apache.spark.sql.graft.RowFilterRule(spark))
    try {
      // no role set: full table
      spark.conf.set("graft.rbac.role", "")
      assert(spark.table("raw_rule").count() == 40)

      spark.conf.set("graft.rbac.role", "core")
      spark.conf.set("graft.rbac.table", "raw_rule")
      assert(spark.table("raw_rule").count() == 10) // api-a only
      // same SQL text, filtered aggregation
      val rows = spark.sql(
        "SELECT endpoint, COUNT(*) FROM raw_rule GROUP BY endpoint").collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("api-a"))

      // pii role: unfiltered again
      spark.conf.set("graft.rbac.role", "pii")
      assert(spark.table("raw_rule").count() == 40)

      // Trust-model boundary (documented in the rule's scaladoc): a
      // direct PATH read has no catalogTable, so the rule does not apply —
      // storage ACLs, not this rule, are what close that path. The sound
      // in-engine enforcement is Rbac.runAs over role views.
      spark.conf.set("graft.rbac.role", "core")
      assert(spark.read.json(root).count() == 40,
        "path-read bypass is expected and documented; if this starts " +
          "being filtered, the trust-model scaladoc is stale")
    } finally {
      spark.conf.set("graft.rbac.role", "")
      spark.conf.set("graft.rbac.table", "")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(
          _.isInstanceOf[org.apache.spark.sql.graft.RowFilterRule])
    }
  }
}
