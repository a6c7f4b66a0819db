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

  test("append merges a delta exactly like a full rebuild") {
    // Split the embeddings: base (vec_id % 10 != 0) indexed up front,
    // delta appended. Because centroid state persists exact decimal
    // sums, the merged centroids are bit-identical to a rebuild's, so
    // probes route to the same cells and score identically — the
    // property that makes incremental IVF maintenance safe.
    val emb = Tables(spark, sfDir, "embeddings")
    val baseDir = tmpDir("ann-base")
    val fullDir = tmpDir("ann-full")
    emb.filter(col("vec_id") % 10 =!= 0)
      .coalesce(1).write.parquet(s"$baseDir/embeddings.parquet")
    emb.coalesce(1).write.parquet(s"$fullDir/embeddings.parquet")

    val rootInc = tmpDir("ann-inc") + "/idx"
    AnnIndex.buildIfMissing(spark, baseDir, rootInc)
    AnnIndex.append(spark, rootInc,
      emb.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"), col("embedding"), col("label")))
    val rootFull = tmpDir("ann-fullidx") + "/idx"
    AnnIndex.buildIfMissing(spark, fullDir, rootFull)

    // merged centroid state must be exactly the rebuild's
    val stInc = spark.read.parquet(s"$rootInc/centroid_state")
      .orderBy("label", "pos").collect().map(_.toString).toSeq
    val stFull = spark.read.parquet(s"$rootFull/centroid_state")
      .orderBy("label", "pos").collect().map(_.toString).toSeq
    assert(stInc == stFull, "merged centroid state diverged from rebuild")

    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        vec_norm(col("embedding")).as("q_norm"))
    def results(root: String) =
      AnnIndex.probe(spark, root, queries, nProbe = 2, k = 5)
        .orderBy("q_id", "rank").collect().map(_.toString).toSeq
    val inc = results(rootInc)
    assert(inc == results(rootFull),
      "merged index probes diverged from rebuild")
    assert(inc.nonEmpty)
    // and some appended vector actually surfaces as a neighbour
    assert(AnnIndex.probe(spark, rootInc, queries, 2, 5)
      .filter(col("c_id") % 10 === 0).count() > 0,
      "no appended vector ever surfaced as a neighbour")
  }

  test("recluster rebalances a drifted index; full-coverage probes " +
      "identical") {
    // round-14 verdict item 7: append keeps centroids exact but never
    // re-assigns old vectors, so drifty ingest concentrates in few
    // cells — recluster is the OPTIMIZE analog that restores the
    // nProbe/k read bound.
    val emb = Tables(spark, sfDir, "embeddings")
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    val root = tmpDir("ann-recluster") + "/idx"
    AnnIndex.buildIfMissing(spark, sfDir, root)
    val before = AnnIndex.imbalance(spark, root)
    // drift: a blob of near-identical vectors appended into ONE cell
    val blob = spark.range(1000000L, 1000000L + 400L).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(1, $dims), " +
        "i -> 7.5 + cast(id % 3 as double) / 1000.0)")
        .cast("array<float>").as("embedding"),
      lit(0L).as("label"))
    AnnIndex.append(spark, root, blob)
    val drifted = AnnIndex.imbalance(spark, root)
    assert(drifted > before * 1.5,
      s"the drift blob should skew occupancy: $before -> $drifted")
    val nCells = AnnIndex.cellStats(spark, root).count().toInt
    val nVecs = AnnIndex.cellStats(spark, root)
      .agg(sum(col("n"))).first().getLong(0)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        vec_norm(col("embedding")).as("q_norm"))
    // nProbe >= cell count ⇒ the probe covers the index: results must
    // be IDENTICAL across the re-cluster modulo the storage-internal
    // cell label (no vector lost, duplicated, or rescored)
    def full(root: String) =
      AnnIndex.probe(spark, root, queries, nProbe = nCells + 4, k = 7)
        .select("q_id", "c_id", "cos_sim", "rank")
        .orderBy("q_id", "rank").collect().map(_.toString).toSeq
    val covBefore = full(root)

    AnnIndex.recluster(spark, root, iterations = 2)

    val after = AnnIndex.imbalance(spark, root)
    assert(after < drifted,
      s"recluster must reduce imbalance: $drifted -> $after")
    assert(AnnIndex.cellStats(spark, root)
      .agg(sum(col("n"))).first().getLong(0) == nVecs,
      "recluster lost or duplicated vectors")
    assert(full(root) == covBefore,
      "full-coverage probe diverged across recluster")
    // the marker is back: buildIfMissing is a no-op again
    AnnIndex.buildIfMissing(spark, sfDir, root)
    assert(full(root) == covBefore)
    // and the exact state still matches its own vectors (append-safe):
    // state n per cell equals the cell occupancy
    val occ = AnnIndex.cellStats(spark, root)
      .orderBy("label").collect()
      .map(r => (r.get(0).toString.toLong, r.getLong(1)))
    val st = spark.read.parquet(s"$root/centroid_state")
      .filter(col("pos") === 0).select(col("label"), col("n"))
      .orderBy("label").collect()
      .map(r => (r.get(0).toString.toLong, r.getLong(1)))
    assert(occ.toSeq == st.toSeq,
      "centroid_state counts diverged from the reclustered occupancy")
  }
}
