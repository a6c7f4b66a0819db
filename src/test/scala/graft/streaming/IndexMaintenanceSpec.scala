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
