package graft.operators

import graft.SparkSpec
import graft.core.Tables
import graft.functions.VectorFunctions.vec_norm
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The persisted IVF index must deliver the scale property it exists for:
  * a probe reads only the probed cells' partitions, not the corpus. */
class AnnIndexSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("probe scans only the probed cells' partitions") {
    // AQE wraps the physical plan in an adaptive node whose children are
    // hidden from collect(); the scan-shape assertions below need the
    // plain plan. Semantics are unaffected.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try probeAssertions() finally
      spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def probeAssertions(): Unit = {
    val root = tmpDir("ann") + "/idx"
    AnnIndex.buildIfMissing(spark, sfDir, root)
    // idempotent: a second build is a no-op (marker-gated)
    AnnIndex.buildIfMissing(spark, sfDir, root)

    val nLabels = Tables(spark, sfDir, "embeddings")
      .select("label").distinct().count()
    assert(nLabels > 2, "need >2 cells for pruning to be observable")

    val queries = Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        vec_norm(col("embedding")).as("q_norm"))
    val res = AnnIndex.probe(spark, root, queries, nProbe = 2, k = 5)

    // the vectors scan carries a partition filter on the cell id and
    // touches at most |queries| x nProbe of the label partitions
    val scans = res.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("vectors")) => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScan over the vectors dir")
    val scan = scans.head
    val partFilters = scan.partitionFilters.mkString(",")
    assert(partFilters.contains("label"),
      s"expected a partition filter on label, got: $partFilters")
    res.collect()
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
      .getOrElse(scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters).length.toLong)
    assert(partsRead < nLabels && partsRead <= 10,
      s"probe touched $partsRead of $nLabels cells")

    // and the result is exactly the inline-IVF result (same math)
    val viaS03 = graft.queries.Similarity.s03_ivf_ann
      .run(spark, sfDir).collect().map(_.toString).toSeq
    val viaIndex = res.orderBy(col("q_id"), col("rank"))
      .collect().map(_.toString).toSeq
    assert(viaIndex == viaS03)
  }
}
