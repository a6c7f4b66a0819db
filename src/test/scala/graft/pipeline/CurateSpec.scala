package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The curation funnel must be monotone, internally consistent,
  * deterministic, and actually enforce each drop rule on the output. */
class CurateSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val (out, report) = {
    val dir = tmpDir("curate")
    (dir, Curate.run(spark, sfDir, dir))
  }

  test("stage counts are monotone and splits partition the final set") {
    assert(report.input >= report.afterExact)
    assert(report.afterExact >= report.afterNearDup)
    assert(report.afterNearDup >= report.afterQuality)
    assert(report.afterQuality >= report.afterDecontam)
    assert(report.afterDecontam > 0, "funnel dropped everything")
    assert(report.splits.values.sum == report.afterDecontam)
    assert(report.splits.keySet.subsetOf(Set("train", "valid", "test")))
  }

  test("every drop rule holds on the written curated set") {
    val curated = spark.read.parquet(s"$out/curated")
    assert(curated.count() == report.afterDecontam)
    // exact dedup: no two curated docs share a text digest
    assert(curated.select(md5(col("text"))).distinct().count()
      == report.afterDecontam)
    // held-out evaluation slice is excluded
    assert(curated.filter(col("doc_id") % 89 === 0).count() == 0)
    // split column exists and is the md5 bucketing (spot-check round trip)
    val bad = curated.withColumn("bucket",
        expr("pmod(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT), 100)"))
      .filter(
        (col("bucket") < 80 && col("split") =!= "train") ||
          (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "valid") ||
          (col("bucket") >= 90 && col("split") =!= "test"))
    assert(bad.count() == 0)
  }

  test("the funnel is deterministic: a second run reproduces the manifest") {
    val dir2 = tmpDir("curate2")
    val report2 = Curate.run(spark, sfDir, dir2)
    assert(report2 == report)
    // byte-level: same curated doc_ids
    val a = spark.read.parquet(s"$out/curated").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = spark.read.parquet(s"$dir2/curated").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("rebalance stage: equalizes the surviving mix, smallest source whole") {
    val dir = tmpDir("curate-reb")
    val r = Curate.run(spark, sfDir, dir, rebalanceMix = true)
    val nBal = r.afterRebalance.getOrElse(fail("afterRebalance missing"))
    assert(nBal <= r.afterDecontam && nBal > 0)
    assert(r.splits.values.sum == nBal)
    assert(r.json.contains("\"after_rebalance\":" + nBal))
    // per-source counts: all within sampling noise of the smallest
    // surviving source (exact-rational accept keeps the min source whole)
    val curated = spark.read.parquet(s"$dir/curated")
    val bySource = curated.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minCount = bySource.values.min
    bySource.values.foreach { n =>
      assert(n <= minCount * 2,
        s"rebalanced source count $n far above min $minCount")
    }
    // determinism: a second rebalanced run reproduces the manifest
    val dir2 = tmpDir("curate-reb2")
    assert(Curate.run(spark, sfDir, dir2, rebalanceMix = true) == r)
  }

  test("manifest file is valid machine-readable JSON") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "manifest.json")), "UTF-8")
    assert(txt.contains("\"after_decontam\":" + report.afterDecontam))
    assert(txt.trim.startsWith("{") && txt.trim.endsWith("}"))
  }
}
