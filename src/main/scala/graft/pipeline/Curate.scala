package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.{Dedup, Text}

/** End-to-end training-data curation: the LLM counterpart of
  * [[graft.tools.Pipeline]]'s reference dataflow, composing the
  * oracle-verified operators into the standard corpus-curation funnel:
  *
  *   documents
  *     → exact dedup        (keep each md5 group's canonical min doc_id)
  *     → near-dup removal   (default CLUSTER mode: connected components
  *                           over the LSH pair graph at `simThreshold` —
  *                           d12's transitive closure — keeping one
  *                           min-doc_id canonical per component, the only
  *                           policy that guarantees one survivor per
  *                           transitive cluster; `clusterDedup = false`
  *                           falls back to per-pair larger-id dropping,
  *                           which keeps spurious extra survivors when a
  *                           chain's hub has the largest id)
  *     → semantic near-dup  (opt-in: d09's learned-cell embedding pairs
  *                           at cosine ≥ `semanticThreshold`, restricted
  *                           to the current survivors, one canonical per
  *                           connected component — catches paraphrase
  *                           duplicates that share no token shingles)
  *     → quality filter     (t02 score ≥ `qualityThreshold`)
  *     → decontamination    (drop training docs sharing ≥3 shingles with
  *                           the held-out slice — d08's sweep)
  *     → mix rebalance      (opt-in: stratified downsample of the
  *                           survivors to the smallest source's size —
  *                           t16's exact-rational sampler, salted hash)
  *     → deterministic split (t10's md5 bucketing, 80/10/10)
  *     → curated parquet partitioned by split + a JSON manifest
  *
  * Every stage is an (anti-)join against a digest-sized side — document
  * text never re-shuffles after its one banding/scoring pass — so the
  * funnel runs at corpus scale exactly like its constituent operators.
  * Each drop rule is deterministic (min-id canonical, hash split), so two
  * runs over the same corpus produce byte-identical curated sets — the
  * reproducibility a training pipeline audit needs.
  */
object Curate {
  final case class Report(
      input: Long,
      afterExact: Long,
      afterNearDup: Long,
      afterQuality: Long,
      afterDecontam: Long,
      splits: Map[String, Long],
      afterRebalance: Option[Long] = None,
      nearDupClusters: Option[Long] = None,
      afterSemantic: Option[Long] = None) {
    def json: String = {
      val sp = splits.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      val cl = nearDupClusters.fold("")(n => s""""neardup_clusters":$n,""")
      val sem = afterSemantic.fold("")(n => s""""after_semantic":$n,""")
      val reb = afterRebalance.fold("")(n => s""""after_rebalance":$n,""")
      s"""{"input":$input,"after_exact_dedup":$afterExact,""" +
        s"""$cl"after_neardup":$afterNearDup,$sem""" +
        s""""after_quality":$afterQuality,""" +
        s""""after_decontam":$afterDecontam,$reb"splits":$sp}"""
    }
  }

  /** Run the funnel; write `outDir/curated` (parquet, partitioned by
    * split) and `outDir/manifest.json`; return the per-stage counts. */
  def run(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      simThreshold: Double = 0.5,
      qualityThreshold: Double = 0.5,
      rebalanceMix: Boolean = false,
      clusterDedup: Boolean = true,
      semanticDedup: Boolean = false,
      semanticThreshold: Double = 0.9): Report = {
    val docs = Tables(spark, sfDir, "documents")
    val input = docs.count()

    // Each stage frame is cached before its count: the manifest needs a
    // count per stage AND the final write, and without the barriers every
    // action would re-execute the whole uncached upstream funnel (the
    // write alone would be the fifth full computation). The caches chain —
    // stage N+1 reads stage N's cached blocks — so the corpus-scale work
    // (digests, banding, scoring) runs once; all caches are dropped in
    // the finally.
    val cached = Seq.newBuilder[DataFrame]
    def stage(df: DataFrame): DataFrame = { cached += df.cache(); df }
    try {
      // 1. exact dedup: d01's canonical ids ARE the survivors
      val canonical = Dedup.d01_exact_dedup.run(spark, sfDir)
        .select(col("canonical_id").as("doc_id"))
      val exact = stage(docs.join(canonical, "doc_id"))
      val nExact = exact.count()

      // 2. near-dup removal. Cluster mode (default): one min-doc_id
      // canonical per connected component of the LSH pair graph — d12's
      // transitive closure, the only policy that guarantees one survivor
      // per transitive cluster (A~B, B~C with the hub holding the
      // largest id keeps BOTH ends under pairwise dropping). The cluster
      // canonical always survives stage 1: exact duplicates share every
      // band, so an exact group lies inside one component, making the
      // component's min id the min of its own md5 group. Estimated
      // Jaccard comes from the banded signatures — never rescans text.
      var nClusters: Option[Long] = None
      val nearDeduped = stage(if (clusterDedup) {
        val clusters = Dedup.dupClusters(spark, sfDir, simThreshold)
        // the manifest metric counts multi-doc clusters AMONG STAGE-1
        // SURVIVORS — clusters whose extra members are all byte-identical
        // copies were already fully handled by exact dedup and would
        // inflate a "near-dup contamination" reading of the manifest
        nClusters = Some(clusters
          .join(exact.select(col("doc_id")), "doc_id")
          .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
          .filter(col("n_members") >= 2).count())
        exact.join(
          clusters.filter(col("cluster_id") === col("doc_id"))
            .select(col("doc_id")),
          "doc_id")
      } else {
        // legacy pairwise policy: drop the larger id of each pair
        val dropNear = Dedup.d04_lsh_pairs.run(spark, sfDir)
          .filter(col("est_sim") >= simThreshold)
          .select(col("b_id").as("doc_id")).distinct()
        exact.join(dropNear, Seq("doc_id"), "left_anti")
      })
      val nNear = nearDeduped.count()

      // 2.5 (opt-in) semantic near-dup: paraphrase duplicates share no
      // shingles, so they sail through stages 1-2; d09's learned-cell
      // embedding pairs catch them (vec_id and doc_id share one id
      // space in the testdata layout). The component graph is RESTRICTED
      // to current survivors — a semantic cluster whose global canonical
      // already died in text dedup must still keep its min SURVIVING
      // member, not lose the content outright.
      val semDeduped = if (!semanticDedup) nearDeduped else stage {
        val ids = nearDeduped.select(col("doc_id"))
        val pairs = Dedup.d09_semantic_neardup.run(spark, sfDir)
          .filter(col("cos_sim") >= semanticThreshold)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val edges = pairs
          .join(ids, pairs("src") === ids("doc_id"), "left_semi")
          .join(ids, pairs("dst") === ids("doc_id"), "left_semi")
        val keep = Dedup
          .connectedComponents(ids.withColumnRenamed("doc_id", "id"), edges)
          .filter(col("id") === col("label"))
          .select(col("id").as("doc_id"))
        nearDeduped.join(keep, "doc_id")
      }
      val nSemantic = if (semanticDedup) Some(semDeduped.count()) else None

      // 3. quality floor (t02's saturation + diversity + stopword score)
      val quality = Text.t02_quality_score.run(spark, sfDir)
        .filter(col("quality") >= qualityThreshold)
        .select(col("doc_id"))
      val qualified = stage(semDeduped.join(quality, "doc_id"))
      val nQuality = qualified.count()

      // 4. decontamination: drop flagged TRAIN docs; the held-out slice
      // (doc_id % 89 == 0) is also excluded from the curated set — it is
      // the evaluation data, not training data
      val contaminated = Dedup.d08_decontamination.run(spark, sfDir)
        .select(col("train_id").as("doc_id")).distinct()
      val clean = stage(qualified
        .join(contaminated, Seq("doc_id"), "left_anti")
        .filter(col("doc_id") % 89 =!= 0))
      val nClean = clean.count()

      // 4.5 (opt-in) mix rebalance: stratified downsample of the
      // SURVIVORS to their smallest source's size — t16's exact-rational
      // accept test (bucket·n < min·1e6, no float rate) applied after
      // the drop stages, because dedup/quality survival itself skews the
      // mix, so rebalancing anywhere earlier would be undone. The accept
      // hash is salted ('mix:' prefix) so membership is independent of
      // the split bucketing below — unsalted, the two decisions would
      // read correlated ranges of the same md5.
      val balanced = if (!rebalanceMix) clean else {
        import org.apache.spark.sql.expressions.Window
        val stats = clean.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("min_docs",
            min(col("n_docs")).over(Window.partitionBy()))
        stage(clean
          .withColumn("mix_bucket", expr(graft.core.Sampling
            .md5Bucket("CAST(doc_id AS STRING)", 1000000, salt = "mix:")))
          .join(broadcast(stats), "source")
          .filter(graft.core.Sampling.stratifiedAccept(
            col("mix_bucket"), col("n_docs"), col("min_docs"), 1000000L))
          .drop("mix_bucket", "n_docs", "min_docs"))
      }
      val nBalanced = if (rebalanceMix) Some(balanced.count()) else None

      // 5. deterministic split (same md5 bucketing as t10) and write
      val curated = balanced
        .withColumn("bucket", expr(
          graft.core.Sampling.md5Bucket("CAST(doc_id AS STRING)", 100)))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "valid")
            .otherwise("test"))
        .drop("bucket")
      curated.write.mode("overwrite").partitionBy("split")
        .parquet(s"$outDir/curated")

      val splits = spark.read.parquet(s"$outDir/curated")
        .groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val report = Report(input, nExact, nNear, nQuality, nClean, splits,
        nBalanced, nClusters, nSemantic)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, "manifest.json"),
        (report.json + "\n").getBytes("UTF-8"))
      report
    } finally cached.result().foreach(_.unpersist(false))
  }

  /** CLI: graft.pipeline.Curate <sfDir> <outDir> [rebalance] [pairwise]
    * [semantic]. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.drop(1).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-curate").toString)
    val rebalance = args.contains("rebalance")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val report = run(spark, sfDir, outDir, rebalanceMix = rebalance,
      clusterDedup = !args.contains("pairwise"),
      semanticDedup = args.contains("semantic"))
    println(report.json)
    println(s"curated -> $outDir/curated")
    spark.stop()
  }
}
