package graft.pipeline

import graft.SparkSpec
import graft.queries.{Dedup, Similarity}

/** The end-to-end LLM lane (round-8 verdict stretch #8): ingest ->
  * curate -> stream-maintained dedup index + batch-built ANN index ->
  * probe, all in one `tools.Pipeline.llmLane` run — whose probe results
  * must be ROW-IDENTICAL to the oracle-gated batch queries
  * (d15_lsh_probe / s05_ann_index). The dedup index here is built by
  * TWO streaming drains (90% base + late arrivals) into a work-dir
  * root, so the pin also proves incremental maintenance converges to
  * the batch build's answers. */
class PipelineLlmSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.01"

  private lazy val (report, dedupHits, annHits) =
    graft.tools.Pipeline.llmLane(spark, sfDir, tmpDir("pipeline-llm"))

  test("curation ran with full provenance") {
    assert(report.afterDecontam > 0)
    assert(report.stages.nonEmpty && report.splits.values.sum > 0)
  }

  test("stream-maintained dedup index answers probes like the batch query") {
    val batch = Dedup.d15_lsh_probe.run(spark, sfDir).collect().toSeq
    val piped = dedupHits.collect().toSeq
    assert(batch.nonEmpty, "batch d15 returned nothing — probe set empty?")
    assert(piped == batch,
      s"pipeline dedup probe diverged: ${piped.size} vs ${batch.size} rows")
  }

  test("work-dir ANN index answers probes like the batch query") {
    val batch = Similarity.s05_ann_index.run(spark, sfDir).collect().toSeq
    val piped = annHits.collect().toSeq
    assert(batch.nonEmpty)
    assert(piped == batch,
      s"pipeline ann probe diverged: ${piped.size} vs ${batch.size} rows")
  }
}
