package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: A/B the curation funnel's opt-in semantic-dedup stage
  * (VERDICT r6 stretch item 7) and characterize what the stage would
  * drop, to decide whether default-on is safe.
  *
  * Protocol: run [[graft.pipeline.Curate]] twice (semantic off / on at
  * the given cosine threshold) over the same corpus, print both
  * manifests, then audit every ≥threshold embedding pair among the
  * text-dedup survivors by its word-3-gram Jaccard:
  *   - jaccard ≥ 0.5  — textual near-dup anyway (MinHash-visible; the
  *     semantic stage is merely a second chance for these)
  *   - 0.1 ≤ j < 0.5  — partial overlap (template/boilerplate kin)
  *   - jaccard < 0.1  — NO shared shingles: either a true paraphrase
  *     (the stage's reason to exist) or a false positive. With no human
  *     labels this bucket IS the upper bound on the FP rate.
  *
  * Usage: graft.tools.CurateAb [sfDir] [threshold]
  */
object CurateAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val thr = args.drop(1).headOption.map(_.toDouble).getOrElse(0.9)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val offDir = java.nio.file.Files.createTempDirectory("ab-off").toString
    val onDir = java.nio.file.Files.createTempDirectory("ab-on").toString
    val off = graft.pipeline.Curate.run(spark, sfDir, offDir)
    val on = graft.pipeline.Curate.run(spark, sfDir, onDir,
      semanticDedup = true, semanticThreshold = thr)
    println(s"A (semantic off): ${off.json}")
    println(s"B (semantic on @ $thr): ${on.json}")
    val extra = off.afterNearDup - on.afterSemantic.getOrElse(off.afterNearDup)
    println(f"semantic stage drops $extra of ${off.afterNearDup} " +
      f"stage-2 survivors (${100.0 * extra / off.afterNearDup}%.2f%%)")

    // Audit the candidate pairs the stage acts on: cosine ≥ thr pairs
    // whose BOTH ends survived text dedup, bucketed by text Jaccard.
    val survivors = spark.read.parquet(s"$offDir/curated")
      .select(col("doc_id"))
    val pairs = graft.SparkEntry.queries("d09_semantic_neardup")(spark, sfDir)
      .filter(col("cos_sim") >= thr)
      .select(col("a_id"), col("b_id"), col("cos_sim"))
    val docs = graft.core.Tables(spark, sfDir, "documents")
      .withColumn("toks", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
      .withColumn("sh", expr("""
        CASE WHEN size(toks) >= 3 THEN
          array_distinct(transform(sequence(0, size(toks) - 3),
            i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])))
        ELSE array_distinct(slice(toks, 1, 0)) END"""))
      .select(col("doc_id"), col("sh"), col("source"))
    val audited = pairs
      .join(survivors.withColumnRenamed("doc_id", "a_id"), "a_id", "left_semi")
      .join(survivors.withColumnRenamed("doc_id", "b_id"), "b_id", "left_semi")
      .join(docs.select(col("doc_id").as("a_id"), col("sh").as("sh_a"),
        col("source").as("src_a")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("sh").as("sh_b"),
        col("source").as("src_b")), "b_id")
      .withColumn("n_common",
        expr("size(array_intersect(sh_a, sh_b))").cast("long"))
      .withColumn("jaccard", when(
        expr("size(sh_a) + size(sh_b)") - col("n_common") > 0,
        col("n_common").cast("double") /
          (expr("size(sh_a) + size(sh_b)") - col("n_common")))
        .otherwise(0.0))
      .select(col("a_id"), col("b_id"), col("cos_sim"), col("jaccard"),
        (col("src_a") === col("src_b")).as("same_source"))
      .cache()
    val total = audited.count()
    val textual = audited.filter(col("jaccard") >= 0.5).count()
    val partial = audited.filter(
      col("jaccard") >= 0.1 && col("jaccard") < 0.5).count()
    val pure = audited.filter(col("jaccard") < 0.1).count()
    val pureSame = audited.filter(
      col("jaccard") < 0.1 && col("same_source")).count()
    println(f"pairs @ cos>=$thr among survivors: $total")
    println(f"  textual (j>=0.5):        $textual (${pct(textual, total)})")
    println(f"  partial (0.1<=j<0.5):    $partial (${pct(partial, total)})")
    println(f"  pure-semantic (j<0.1):   $pure (${pct(pure, total)})" +
      f" — same-source $pureSame")
    println("pure-semantic pairs are paraphrases-or-FPs: this bucket is " +
      "the FP-rate UPPER BOUND absent human labels")
    audited.filter(col("jaccard") < 0.1)
      .orderBy(col("cos_sim").desc).show(10, truncate = false)
    spark.stop()
  }

  private def pct(n: Long, d: Long): String =
    if (d == 0) "n/a" else f"${100.0 * n / d}%.1f%%"
}
