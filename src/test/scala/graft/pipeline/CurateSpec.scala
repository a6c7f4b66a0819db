package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The curation funnel must be monotone, internally consistent,
  * deterministic, and actually enforce each drop rule on the output. */
// excluded from the default `sbt test` (CI budget) — run with
// GRAFT_TEST_ALL=1 or `testOnly`; see build.sbt
@org.scalatest.tags.Slow
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

  /** Synthetic corpus for the transitivity/semantic cases: a 3-doc LSH
    * chain whose HUB holds the LARGEST id (docs 1 and 2 each pair with
    * hub 3, but never with each other — verified against d04 below), so
    * pairwise larger-id dropping keeps the two spurious chain ends while
    * cluster mode keeps exactly the canonical; plus filler docs 10-15
    * with fully disjoint token sets, of which 10 and 11 carry IDENTICAL
    * embeddings (a paraphrase-duplicate stand-in: no shared shingles, so
    * text dedup cannot see it). All ids avoid the doc_id % 89 == 0
    * held-out slice so decontamination stays a no-op.
    */
  private lazy val chainDir: String = {
    import spark.implicits._
    val dir = tmpDir("curate-fixture")
    // tail width 4 re-verified against the round-11 slot-hash family
    // (the d04 precondition below pins the edge shape — a family change
    // that breaks the chain fails THERE, not in the policy assertions)
    val core = (0 until 28).map(i => s"core$i")
    val aText = (core.dropRight(4) ++ (0 until 4).map(i => s"atail$i")).mkString(" ")
    val cText = ((0 until 4).map(i => s"chead$i") ++ core.drop(4)).mkString(" ")
    val bText = core.mkString(" ")
    val fillers = (10L to 15L).map(i =>
      i -> (0 until 12).map(j => s"fill${i}x$j").mkString(" "))
    (Seq(1L -> aText, 2L -> cText, 3L -> bText) ++ fillers)
      .map { case (id, text) =>
        (id, text, "en", if (id % 2 == 0) "web" else "book", text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ids = Seq(1L, 2L, 3L) ++ (10L to 15L)
    ids.map { id =>
      val dim = if (id == 11L) 10 else (id % 64).toInt // 11 duplicates 10
      val v = Array.fill(64)(0f); v(dim) = 1f
      (id, v.toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("cluster-mode near-dup keeps exactly one doc of a transitive chain") {
    import graft.queries.Dedup
    // precondition: the LSH edge set over the chain is {1~3, 2~3}, never
    // 1~2 — the shape where pairwise dropping provably over-keeps
    val chainPairs = Dedup.d04_lsh_pairs.run(spark, chainDir)
      .filter(col("est_sim") >= 0.5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(chainPairs == Set((1L, 3L), (2L, 3L)),
      s"fixture no longer produces the intended chain: $chainPairs")

    val dir = tmpDir("curate-cluster")
    val r = Curate.run(spark, chainDir, dir, qualityThreshold = 0.0)
    val chainSurvivors = spark.read.parquet(s"$dir/curated")
      .filter(col("doc_id") <= 3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(chainSurvivors == Set(1L),
      s"cluster mode must keep only the component canonical: $chainSurvivors")
    assert(r.nearDupClusters.contains(1L),
      s"manifest must report the one multi-doc cluster: ${r.nearDupClusters}")
    assert(r.json.contains("\"neardup_clusters\":1"))

    // the pairwise policy keeps BOTH chain ends (3 is the larger id of
    // each pair) — the exact over-keep cluster mode exists to fix
    val dirP = tmpDir("curate-pairwise")
    Curate.run(spark, chainDir, dirP, qualityThreshold = 0.0,
      clusterDedup = false)
    val pairwiseSurvivors = spark.read.parquet(s"$dirP/curated")
      .filter(col("doc_id") <= 3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(pairwiseSurvivors == Set(1L, 2L),
      s"pairwise baseline changed shape: $pairwiseSurvivors")
  }

  test("semantic stage drops embedding duplicates text dedup cannot see") {
    val dir = tmpDir("curate-semantic")
    val r = Curate.run(spark, chainDir, dir, qualityThreshold = 0.0,
      semanticDedup = true)
    val nSem = r.afterSemantic.getOrElse(fail("afterSemantic missing"))
    assert(nSem == r.afterNearDup - 1,
      s"exactly the one embedding duplicate should drop: $r")
    val survivors = spark.read.parquet(s"$dir/curated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.contains(10L) && !survivors.contains(11L),
      s"semantic canonical must be the min surviving id: $survivors")
    assert(r.json.contains("\"after_semantic\":" + nSem))
    // without the stage, 11 survives — the duplicate is invisible to text
    val dir2 = tmpDir("curate-nosem")
    Curate.run(spark, chainDir, dir2, qualityThreshold = 0.0)
    val noSem = spark.read.parquet(s"$dir2/curated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(noSem.contains(11L))
  }

  test("semantic default-on A/B: no-op on the real corpus at 0.9 cosine") {
    // The default-on evaluation (VERDICT r6 stretch 7), pinned as a
    // canary: on the driver testdata the embedding landscape tops out at
    // cosine ~0.60 between distinct vectors (verified by brute force at
    // sf0.1), so at the 0.9 default threshold the stage drops NOTHING —
    // measured FP rate 0, measured benefit 0. Default therefore stays
    // opt-in (the stage costs a full d09 pass). If a future testdata
    // generation grows real paraphrase pairs, this equality breaks and
    // the default decision must be re-evaluated (tools/CurateAb is the
    // measurement harness).
    val dirOff = tmpDir("ab-off")
    val dirOn = tmpDir("ab-on")
    val off = Curate.run(spark, sfDir, dirOff)
    val on = Curate.run(spark, sfDir, dirOn,
      semanticDedup = true, semanticThreshold = 0.9)
    assert(on.afterSemantic.contains(off.afterNearDup),
      s"semantic stage dropped docs on the real corpus: off=$off on=$on")
    assert(off.splits == on.splits,
      "curated splits diverged between semantic off/on")
  }

  test("manifest carries full stage provenance and the semantic A/B evidence") {
    val dir = tmpDir("curate-manifest")
    val r = Curate.run(spark, sfDir, dir, auditSemantic = true)
    // ordered stage trail: every stage present (enabled or not), knobs
    // recorded, counts chain stage-to-stage and tie back to the report —
    // the audit a pipeline operator needs to answer "why did doc X die"
    assert(r.stages.map(_.name) == Seq("exact_dedup", "neardup",
      "semantic_neardup", "quality_filter", "decontamination",
      "mix_rebalance", "pii_scrub", "split"))
    r.stages.sliding(2).foreach {
      case Seq(a, b) => assert(a.out == b.in, s"${a.name}.out != ${b.name}.in")
      case _ => ()
    }
    assert(r.stages.head.in == r.input)
    assert(r.stages.last.out == r.splits.values.sum)
    val byName = r.stages.map(s => s.name -> s).toMap
    // disabled stages are explicit pass-throughs, never absent
    assert(!byName("semantic_neardup").enabled)
    assert(byName("semantic_neardup").in == byName("semantic_neardup").out)
    assert(!byName("mix_rebalance").enabled)
    assert(byName("neardup").params.contains("sim_threshold" -> "0.5"))
    assert(byName("neardup").params.contains("policy" -> "\"cluster\""))
    assert(byName("quality_filter").params.contains("min_quality" -> "0.5"))
    // the A/B evidence behind the semantic OFF default is embedded: the
    // stage's would-drop delta plus the FP-bounding Jaccard buckets
    val ab = r.abSemantic.getOrElse(fail("ab_semantic evidence missing"))
    assert(ab.threshold == 0.9)
    assert(ab.pairs == ab.textual + ab.partial + ab.pureSemantic,
      "jaccard buckets must partition the candidate pairs")
    assert(ab.wouldDrop >= 0 && ab.wouldDrop <= r.afterNearDup)
    // ... and all of it round-trips through manifest.json
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "manifest.json")), "UTF-8")
    assert(txt.contains("\"stages\":["))
    assert(txt.contains("\"stage\":\"semantic_neardup\",\"enabled\":false"))
    assert(txt.contains("\"ab_semantic\":{\"threshold\":0.9"))
    assert(txt.contains("\"sim_threshold\":0.5"))
  }

  test("pii scrub redacts the curated output and records its counts") {
    import spark.implicits._
    // fixture corpus: diverse texts (distinct word tails keep LSH
    // similarity below the loosened threshold), two docs carrying PII.
    // Same schema as the testdata documents table.
    val base = Seq(
      "table scan merge join window batch stream value",
      "customer order revenue nation region supplier part",
      "vector embed cosine cluster centroid probe cell index",
      "token shingle minhash band bucket digest signature hash",
      "quality stopword ratio length saturation diversity score",
      "session funnel retention pivot rollup cube grouping sets",
      "watermark trigger state store output mode append complete",
      "broadcast shuffle exchange partition codegen stage task",
      "parquet footer rowgroup page dictionary encoding stats",
      "salt skew carry asof tolerance bucket stitch boundary",
      "gini zipf entropy surprisal bigram vocabulary coverage",
      "pack bin context boundary crossing fill ratio prefix")
    val rows = base.zipWithIndex.map { case (t, i) =>
      val id = i + 1L
      val txt =
        if (id == 3L) t + " contact ops@example.com from 10.0.0.8"
        else if (id == 7L) t + " dial 555-123-4567 asap"
        else t
      (id, txt, "en", s"src${i % 2}", txt.length.toLong)
    }
    val fx = tmpDir("curate-pii-fixture")
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$fx/documents.parquet")
    val dir = tmpDir("curate-pii-out")
    // thresholds loosened so every fixture doc survives the drop stages:
    // this test is about the scrub, not the filters
    val r = Curate.run(spark, fx, dir,
      simThreshold = 0.95, qualityThreshold = 0.0)
    val pii = r.stages.find(_.name == "pii_scrub")
      .getOrElse(fail("pii_scrub stage missing from manifest"))
    assert(pii.enabled && pii.in == pii.out, "scrub must never drop docs")
    assert(pii.params.contains("pii_docs" -> "2"), pii.params.toString)
    assert(pii.params.contains("pii_hits" -> "3"), pii.params.toString)
    val curated = spark.read.parquet(s"$dir/curated")
    // nothing detectable ships, placeholders + n_chars are consistent
    assert(curated.filter(graft.functions.Pii.hasPii(col("text")))
      .count() == 0, "curated output still contains detectable PII")
    val d3 = curated.filter(col("doc_id") === 3L).select("text", "n_chars")
      .as[(String, Long)].head()
    assert(d3._1.endsWith("contact [EMAIL] from [IP]"), d3._1)
    assert(d3._2 == d3._1.length.toLong, "n_chars not recomputed after scrub")
    // and the scrub can be disabled: raw text passes through untouched
    val dir2 = tmpDir("curate-pii-off")
    val r2 = Curate.run(spark, fx, dir2,
      simThreshold = 0.95, qualityThreshold = 0.0, piiScrub = false)
    assert(!r2.stages.find(_.name == "pii_scrub").get.enabled)
    assert(spark.read.parquet(s"$dir2/curated")
      .filter(col("text").contains("ops@example.com")).count() == 1)
  }

  test("manifest file is valid machine-readable JSON") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "manifest.json")), "UTF-8")
    assert(txt.contains("\"after_decontam\":" + report.afterDecontam))
    assert(txt.trim.startsWith("{") && txt.trim.endsWith("}"))
  }
}
