package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import graft.operators.DedupIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A stream-maintained dedup index must converge to exactly the batch
  * build over the same documents — including when deliveries arrive in
  * multiple micro-batches. */
class IndexMaintenanceSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("in-stream compaction (compactEveryBatches) keeps probes exact") {
    // Compaction as part of the maintenance stream itself: four waves
    // forced through four micro-batches with a fold every 2nd batch.
    // In-batch folding is safe because micro-batches run strictly
    // sequentially and a replayed folded batch is skipped by the
    // cutoff guard; the pin is the strongest one available — the
    // final probe equals the INLINE full-corpus ranking, with the
    // per-batch directory zones folded away.
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val streamDir = tmpDir("inv-compact-stream-in")
    (0 until 4).foreach { w =>
      docs.filter(col("doc_id") % 4 === w)
        .coalesce(1).write.parquet(s"$streamDir/wave=$w")
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("basePath", streamDir)
      .parquet(s"$streamDir/wave=*")
      .select(col("doc_id"), col("text"))
    val root = tmpDir("inv-compact-stream-root")
    val q = IndexMaintenance.maintainInvertedIndex(stream, root,
      compactEveryBatches = Some(2))
    try q.awaitTermination() finally q.stop()

    val got = graft.operators.InvertedIndex
      .probe(spark, root, Seq("spark", "window", "filter")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exp = graft.queries.Search.t31_bm25.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == exp,
      s"in-stream-compacted index diverged:\n got=$got\n exp=$exp")
    // the fold actually ran: compacted layout present, batch zone empty
    val genHis = Option(new java.io.File(s"$root/compacted").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName)
      .collect { case n if n.matches("gen-\\d+-\\d+") =>
        n.stripPrefix("gen-").split("-")(1).toLong }
    assert(genHis.nonEmpty && genHis.max == 3,
      s"expected the last fold to cover batch 3: ${genHis.toSeq}")
    val batchDirs = Option(
        new java.io.File(s"$root/postings_batches").listFiles())
      .map(_.count(f => f.isDirectory && f.getName.startsWith("batch=")))
      .getOrElse(0)
    assert(batchDirs == 0, s"folded batch dirs must be gone: $batchDirs")
  }

  test("stream-maintained index equals the batch build, across batches") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    // two delivery waves as separate files; maxFilesPerTrigger=1 forces
    // them through SEPARATE micro-batches (the cross-batch append path)
    val streamDir = tmpDir("idx-stream-in")
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$streamDir/wave=0")
    docs.filter(col("doc_id") % 2 =!= 0)
      .coalesce(1).write.parquet(s"$streamDir/wave=1")

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("basePath", streamDir)
      .parquet(s"$streamDir/wave=*")
      .select(col("doc_id"), col("text"))

    val rootStream = tmpDir("idx-stream-root")
    val q = IndexMaintenance.maintainDedupIndex(stream, rootStream)
    try q.awaitTermination() finally q.stop()

    val rootBatch = tmpDir("idx-batch-root")
    DedupIndex.buildIfMissing(spark, sfDir, rootBatch)

    val probes = graft.queries.Dedup.bandedWithSigFromText(
      docs.filter(col("doc_id") % 20 < 2))
    def results(root: String) =
      DedupIndex.probe(spark, root, probes).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = results(rootStream)
    val batch = results(rootBatch)
    assert(streamed == batch,
      s"stream-maintained index diverged: stream=${streamed.size} batch=${batch.size}")
    assert(streamed.nonEmpty, "no candidates at smoke scale; weak test")
  }
}
