package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import graft.operators.InvertedIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming BM25-index maintenance must (a) rank exactly like the
  * inline t31 query over everything ingested so far, across
  * micro-batches, and (b) survive foreachBatch's at-least-once
  * contract: replaying a batch id must rewrite the same bytes, never
  * double-count postings or the corpus stats addend. */
class InvertedStreamSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "window", "filter")

  private def docs = Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  private def results(root: String) =
    InvertedIndex.probe(spark, root, terms).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("stream-maintained postings index equals the inline ranking") {
    val streamDir = tmpDir("inv-stream-in")
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$streamDir/wave=0")
    docs.filter(col("doc_id") % 2 =!= 0)
      .coalesce(1).write.parquet(s"$streamDir/wave=1")

    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("basePath", streamDir)
      .parquet(s"$streamDir/wave=*")
      .select(col("doc_id"), col("text"))

    val root = tmpDir("inv-stream-root")
    val q = IndexMaintenance.maintainInvertedIndex(stream, root)
    try q.awaitTermination() finally q.stop()

    val got = results(root)
    val exp = graft.queries.Search.t31_bm25.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty, "empty ranking at smoke scale; weak test")
    assert(got == exp,
      s"stream-maintained ranking diverged:\n got=$got\n exp=$exp")
  }

  test("replaying a batch id is byte-idempotent — no double-counting") {
    val root = tmpDir("inv-replay-root")
    InvertedIndex.appendIdempotent(spark, root,
      docs.filter(col("doc_id") % 2 === 0), batchId = 0L)
    InvertedIndex.appendIdempotent(spark, root,
      docs.filter(col("doc_id") % 2 =!= 0), batchId = 1L)
    val before = results(root)
    // crash-retry: batch 1 re-runs with the same id and the same data
    InvertedIndex.appendIdempotent(spark, root,
      docs.filter(col("doc_id") % 2 =!= 0), batchId = 1L)
    assert(results(root) == before,
      "replaying a completed batch changed the ranking")
    // double-appending through the BATCH path would have doubled df/tf;
    // the idempotent layout still matches the inline ranking exactly
    val exp = graft.queries.Search.t31_bm25.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(before == exp)
  }
}
