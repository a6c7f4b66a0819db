package graft.ingest

import java.io.File

import graft.SparkSpec
import graft.security.Rbac

/** End-to-end ingestion plane: the reference's golden values
  * (README.md:74-106, rbac-demo/README.md:29,88) on locally generated
  * mock data. */
class IngestSpec extends SparkSpec {
  private val cfg = IngestConfig()
  private val date1 = "2026-08-11"
  private val date2 = "2026-08-12"

  private def listPages(root: String): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else Seq(f)
    walk(new File(root)).filter(_.getName.endsWith(".json.gz"))
  }

  test("plan enumerates endpoints x pages") {
    val work = Planner.plan(spark, cfg, date1).collect()
    assert(work.length == 40)
    assert(work.map(_.endpoint).distinct.sorted.toSeq ==
      Seq("api-a", "api-b", "api-c", "api-d"))
    assert(work.filter(_.endpoint == "api-a").map(_.page).sorted.toSeq ==
      (1 to 10))
  }

  test("ingest writes 40 deterministic page files; re-run is idempotent") {
    val root = tmpDir("raw")
    val q = tmpDir("quarantine")
    val stats = RawWriter.write(spark, Planner.plan(spark, cfg, date1),
      MockFetcher(), root, q)
    assert(stats == IngestStats(40, 0, 0))
    val files = listPages(root)
    assert(files.length == 40)
    assert(files.exists(_.getPath.endsWith(
      s"source=api-a/ingestion_date=$date1/page=000003.json.gz")))

    // byte-identical on re-run: files skipped, mtimes untouched
    val mtimes = files.map(f => f.getPath -> f.lastModified).toMap
    val stats2 = RawWriter.write(spark, Planner.plan(spark, cfg, date1),
      MockFetcher(), root, q)
    assert(stats2 == IngestStats(0, 40, 0))
    assert(listPages(root).forall(f => mtimes(f.getPath) == f.lastModified))
  }

  test("crawl + smoke query reproduce the reference goldens") {
    val root = tmpDir("raw")
    RawWriter.write(spark, Planner.plan(spark, cfg, date1), MockFetcher(),
      root, tmpDir("quarantine"))
    val report = Crawler.crawl(spark, root, "raw_smoke")
    assert(report.partitions == 4) // one per endpoint for a single date

    // README.md:74-83: 4 rows, one per source, 10 files each
    val smoke = spark.sql(
      """SELECT source, ingestion_date, COUNT(*) AS files
         FROM raw_smoke GROUP BY 1, 2
         ORDER BY ingestion_date DESC, source""").collect()
    assert(smoke.length == 4)
    assert(smoke.forall(_.getLong(2) == 10))

    // README.md:104-106: cardinality(items) = 5 everywhere; id format
    val card = spark.sql(
      "SELECT DISTINCT cardinality(items) AS c FROM raw_smoke").collect()
    assert(card.map(_.getAs[Number](0).longValue).toSeq == Seq(5L))
    val ids = spark.sql(
      s"""SELECT items[0].id FROM raw_smoke
          WHERE source='api-a' AND page=3""").collect()
    assert(ids.head.getString(0) == s"api-a-$date1-3-0")
    assert(spark.table("raw_smoke").count() == 40)
  }

  test("poison work item is quarantined, not fatal") {
    val root = tmpDir("raw")
    val q = tmpDir("quarantine")
    val poisoned = FailingFetcher(MockFetcher(), Set(("api-b", 7)))
    val stats = RawWriter.write(spark, Planner.plan(spark, cfg, date1),
      poisoned, root, q)
    assert(stats == IngestStats(39, 0, 1))
    assert(listPages(root).length == 39)
    val quarantined = new File(q).listFiles().filter(_.getName.startsWith("failed-"))
    assert(quarantined.nonEmpty)
    val content = scala.io.Source.fromFile(quarantined.head).mkString
    assert(content.contains(""""endpoint":"api-b"""") && content.contains(""""page":7"""))
  }

  test("rbac: identical query, different results per role; column denial throws") {
    val root = tmpDir("raw")
    for (d <- Seq(date1, date2))
      RawWriter.write(spark, Planner.plan(spark, cfg, d), MockFetcher(),
        root, tmpDir("quarantine"))
    Crawler.crawl(spark, root, "raw_rbac")
    Rbac.createRoleViews(spark, "raw_rbac")

    // rbac-demo/README.md:29,88 ratio: core sees only api-a => 20 vs 80
    val q = "SELECT COUNT(*) AS n FROM raw_rbac"
    val coreN = Rbac.runAs(spark, Rbac.core, "raw_rbac", q).collect()(0).getLong(0)
    val piiN = Rbac.runAs(spark, Rbac.pii, "raw_rbac", q).collect()(0).getLong(0)
    assert(coreN == 20 && piiN == 80)

    val byEndpoint = "SELECT endpoint, COUNT(*) AS files FROM raw_rbac GROUP BY endpoint ORDER BY endpoint"
    val coreE = Rbac.runAs(spark, Rbac.core, "raw_rbac", byEndpoint).collect()
    assert(coreE.map(_.getString(0)).toSeq == Seq("api-a"))
    val piiE = Rbac.runAs(spark, Rbac.pii, "raw_rbac", byEndpoint).collect()
    assert(piiE.map(_.getString(0)).toSeq ==
      Seq("api-a", "api-b", "api-c", "api-d"))

    // column-level denial fails loudly for core, succeeds for pii
    val itemsQ = "SELECT endpoint, cardinality(items) FROM raw_rbac LIMIT 3"
    intercept[org.apache.spark.sql.AnalysisException] {
      Rbac.runAs(spark, Rbac.core, "raw_rbac", itemsQ).collect()
    }
    assert(Rbac.runAs(spark, Rbac.pii, "raw_rbac", itemsQ).collect().length == 3)

    // masking role: all rows visible, sensitive column digested not denied
    Rbac.createRoleViews(spark, "raw_rbac", Seq(Rbac.masked))
    val maskedRows = Rbac.runAs(spark, Rbac.masked, "raw_rbac",
      "SELECT fetched_at FROM raw_rbac").collect()
    assert(maskedRows.length == 80)
    assert(maskedRows.forall(_.getString(0).matches("[0-9a-f]{32}")))

    // catalog DDL surface (SURVEY Q13): the crawled table is listed
    assert(spark.sql("SHOW TABLES").collect()
      .exists(_.getString(1) == "raw_rbac"))
  }

  test("corrupt gzip page surfaces as _corrupt_record, not a failed read") {
    val root = tmpDir("raw")
    RawWriter.write(spark, Planner.plan(spark, cfg, date1), MockFetcher(),
      root, tmpDir("quarantine"))
    // a truncated/garbage gz file lands in the raw zone (FIXTURES A3)
    val bad = new java.io.File(
      s"$root/source=api-a/ingestion_date=$date1/page=000098.json.gz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(bad))
    out.write("{not valid json at all".getBytes("UTF-8"))
    out.close()

    val schema = RawSchema.payload
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(root).cache()
    assert(df.filter(df("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(df("_corrupt_record").isNull).count() == 40)
  }

  test("curated promotion explodes items to parquet") {
    val root = tmpDir("raw")
    RawWriter.write(spark, Planner.plan(spark, cfg, date1), MockFetcher(),
      root, tmpDir("quarantine"))
    Crawler.crawl(spark, root, "raw_curated_src")
    val curated = Crawler.promoteCurated(spark, "raw_curated_src", tmpDir("curated"))
    assert(curated.count() == 200) // 40 pages x 5 items
    assert(curated.columns.toSet ==
      Set("source", "ingestion_date", "page", "fetched_at", "item_id", "item_value"))
  }

  test("crawler schema evolution: new column added, missing column deprecated") {
    val root = tmpDir("raw")
    RawWriter.write(spark, Planner.plan(spark, cfg, date1), MockFetcher(),
      root, tmpDir("quarantine"))
    Crawler.crawl(spark, root, "raw_evolve")

    // second generation of pages carries a new field
    val extended = new Fetcher {
      def fetch(w: WorkItem): PageDoc = MockFetcher().fetch(w)
    }
    RawWriter.write(spark, Planner.plan(spark, cfg, date2), extended,
      root, tmpDir("quarantine"))
    // hand-write one page with an extra column to trigger evolution
    val extra = new java.io.File(
      s"$root/source=api-a/ingestion_date=$date2/page=000099.json.gz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(extra))
    out.write(
      s"""{"endpoint":"api-a","date":"$date2","page":99,"fetched_at":"x","items":[],"new_col":"v"}"""
        .getBytes("UTF-8"))
    out.close()

    val report2 = Crawler.crawl(spark, root, "raw_evolve")
    assert(report2.addedColumns == Seq("new_col"))
    assert(spark.table("raw_evolve").columns.contains("new_col"))

    // the column disappears from the data: DEPRECATE policy keeps it in
    // the table but reports it (stack.py:180-193 semantics)
    assert(extra.delete())
    val report3 = Crawler.crawl(spark, root, "raw_evolve")
    assert(report3.deprecatedColumns == Seq("new_col"))
    assert(spark.table("raw_evolve").columns.contains("new_col"))
  }
}
