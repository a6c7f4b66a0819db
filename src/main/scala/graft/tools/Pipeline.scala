package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ingest._
import graft.queries.{QueryRunner, ReferenceQueries}
import graft.security.Rbac

/** End-to-end platform demo: plan -> ingest (idempotent gzip pages) ->
  * crawl (schema inference + partitions) -> secure (role views) ->
  * query per role -> curated promotion. The whole reference dataflow
  * (SURVEY §3 E1-E3) in one run.
  *
  * Usage: graft.tools.Pipeline <workDir> [date1,date2,...]
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-pipeline").toString)
    val dates = args.drop(1).headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("2026-01-11", "2026-01-12"))

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = s"$workDir/raw"
    val cfg = IngestConfig()
    println(s"== ingest -> $raw")
    dates.foreach { d =>
      val stats = RawWriter.write(spark, Planner.plan(spark, cfg, d),
        MockFetcher(), raw, s"$workDir/quarantine")
      println(s"   $d: $stats")
    }

    println("== crawl")
    val report = Crawler.crawl(spark, raw, "raw")
    println(s"   $report")

    println("== secure (role views)")
    Rbac.createRoleViews(spark, "raw")

    println("== query per role")
    for (role <- Seq(Rbac.core, Rbac.pii)) {
      val n = QueryRunner.run(spark, role, "raw", "total",
        ReferenceQueries.totalRecords("raw"), s"$workDir/results")
        .collect()(0).getLong(0)
      println(s"   ${role.name}: total_records = $n")
    }
    println("== smoke query")
    spark.sql(ReferenceQueries.smokeFilesPerPartition("raw"))
      .show(10, truncate = false)

    println("== curated promotion")
    val curated = Crawler.promoteCurated(spark, "raw", s"$workDir/curated")
    println(s"   curated rows: ${curated.count()}")

    spark.stop()
  }
}
