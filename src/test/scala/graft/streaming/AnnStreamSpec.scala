package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import graft.operators.AnnIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ANN maintenance must (a) converge to exactly the batch
  * build over the same vectors, across micro-batches, and (b) survive
  * foreachBatch's at-least-once contract: replaying a batch id must
  * rewrite the same bytes, never double-count the centroid state —
  * the gap that kept ANN out of IndexMaintenance until round 8. */
// excluded from the default `sbt test` (CI budget) — run with
// GRAFT_TEST_ALL=1 or `testOnly`; see build.sbt
@org.scalatest.tags.Slow
class AnnStreamSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def vectors = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"), col("label"))

  private def queries = {
    import graft.functions.VectorFunctions.vec_norm
    Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        vec_norm(col("embedding")).as("q_norm"))
  }

  private def results(root: String) =
    AnnIndex.probe(spark, root, queries, nProbe = 2, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
      .toSet

  test("stream-maintained ANN index equals the batch build, across batches") {
    // two delivery waves forced through separate micro-batches
    val streamDir = tmpDir("ann-stream-in")
    vectors.filter(col("vec_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$streamDir/wave=0")
    vectors.filter(col("vec_id") % 2 =!= 0)
      .coalesce(1).write.parquet(s"$streamDir/wave=1")

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("basePath", streamDir)
      .parquet(s"$streamDir/wave=*")
      .select(col("vec_id"), col("embedding"), col("label"))

    val rootStream = tmpDir("ann-stream-root")
    val q = IndexMaintenance.maintainAnnIndex(stream, rootStream)
    try q.awaitTermination() finally q.stop()

    val rootBatch = tmpDir("ann-batch-root")
    AnnIndex.buildIfMissing(spark, sfDir, rootBatch)

    val streamed = results(rootStream)
    val batch = results(rootBatch)
    assert(streamed.nonEmpty, "no probe hits at smoke scale; weak test")
    assert(streamed == batch,
      s"stream-maintained ANN index diverged: " +
        s"stream=${streamed.size} batch=${batch.size}")
  }

  test("compactBatches: probe-identical fold, dirs collapse, drains continue") {
    // The AnnIndex twin of InvertedIndex.compactBatches (round-9
    // verdict item 1): per-batch state deltas and vector directories
    // fold into generational compacted/gen-<lo>-<hi> with probes row-identical
    // before/after, folded-batch replays skipped, and later drains +
    // a second compaction landing cleanly.
    val root = tmpDir("ann-compact-root")
    AnnIndex.appendIdempotent(spark, root,
      vectors.filter(col("vec_id") % 3 === 0), batchId = 0L)
    AnnIndex.appendIdempotent(spark, root,
      vectors.filter(col("vec_id") % 3 === 1), batchId = 1L)
    val before = results(root)
    def batchDirs(sub: String) = {
      val d = new java.io.File(s"$root/$sub")
      if (!d.exists()) Array.empty[java.io.File]
      else d.listFiles().filter(f =>
        f.isDirectory && f.getName.startsWith("batch="))
    }
    assert(batchDirs("state_deltas").length == 2 &&
      batchDirs("vectors").length == 2)

    assert(AnnIndex.compactBatches(spark, root) == Some(1L))
    assert(results(root) == before, "compaction changed probe results")
    assert(batchDirs("state_deltas").isEmpty && batchDirs("vectors").isEmpty,
      "folded batch directories must be deleted")
    assertTiles(root, 1)
    assert(AnnIndex.compactBatches(spark, root).isEmpty, "nothing to fold")

    // a replayed FOLDED batch id is skipped
    AnnIndex.appendIdempotent(spark, root,
      vectors.filter(col("vec_id") % 3 === 1), batchId = 1L)
    assert(batchDirs("state_deltas").isEmpty && results(root) == before)

    // next drain + second compaction: still equals the full batch build
    AnnIndex.appendIdempotent(spark, root,
      vectors.filter(col("vec_id") % 3 === 2), batchId = 2L)
    val rootBatch = tmpDir("ann-compact-batchref")
    AnnIndex.buildIfMissing(spark, sfDir, rootBatch)
    val full = results(rootBatch)
    assert(results(root) == full,
      "post-compaction drain diverged from the batch build")
    assert(AnnIndex.compactBatches(spark, root) == Some(2L))
    assert(results(root) == full)
    assertTiles(root, 2)
  }

  test("compactBatches refuses a batch-build root") {
    val rootBatch = tmpDir("ann-compact-refuse")
    AnnIndex.buildIfMissing(spark, sfDir, rootBatch)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.compactBatches(spark, rootBatch)
    }
    assert(e.getMessage.contains("batch-build layout"), e.getMessage)
  }

  test("replaying a batch id is byte-idempotent — no double-counted state") {
    val root = tmpDir("ann-replay-root")
    val half = vectors.filter(col("vec_id") % 2 === 0)
    AnnIndex.appendIdempotent(spark, root, half, batchId = 0L)
    AnnIndex.appendIdempotent(spark, root, vectors.filter(col("vec_id") % 2 =!= 0),
      batchId = 1L)
    val before = results(root)
    // crash-retry: batch 1 re-runs with the same id and the same data
    AnnIndex.appendIdempotent(spark, root, vectors.filter(col("vec_id") % 2 =!= 0),
      batchId = 1L)
    assert(results(root) == before,
      "replaying a completed batch changed probe results")
    // and the index still matches a clean batch build
    val rootBatch = tmpDir("ann-replay-batch")
    AnnIndex.buildIfMissing(spark, sfDir, rootBatch)
    assert(results(root) == results(rootBatch))
  }
  /** Live generation ranges under <root>/compacted, ascending. */
  private def genRanges(root: String): Seq[(Long, Long)] = {
    val d = new java.io.File(s"$root/compacted")
    if (!d.exists()) Nil
    else d.listFiles().filter(_.isDirectory).map(_.getName).collect {
      case n if n.matches("gen-\\d+-\\d+") =>
        val p = n.stripPrefix("gen-").split("-")
        (p(0).toLong, p(1).toLong)
    }.toSeq.sortBy(_._1)
  }

  /** The ranges must tile [0, hi] contiguously with no overlap — the
    * generational invariant every reader depends on. */
  private def assertTiles(root: String, hi: Long): Unit = {
    val rs = genRanges(root)
    assert(rs.nonEmpty && rs.head._1 == 0 && rs.last._2 == hi &&
      rs.zip(rs.tail).forall { case (a, b) => b._1 == a._2 + 1 },
      s"generations must tile [0,$hi]: $rs")
  }

}
