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

  test("compactBatches: probe-identical fold, dirs collapse, drains continue") {
    // Round-9 verdict item 1: the replay-safe layout grows one
    // directory per drained batch forever. Compaction must fold them
    // into the build-shaped layout with (a) byte-identical probe AND
    // probeBatch results, (b) directory count collapsing from
    // O(batches) to O(16^width + recent), (c) a replayed folded batch
    // id being a no-op, and (d) post-compaction drains continuing to
    // land — including a SECOND compaction over fold + new batches.
    val root = tmpDir("inv-compact-root")
    InvertedIndex.appendIdempotent(spark, root,
      docs.filter(col("doc_id") % 3 === 0), batchId = 0L)
    InvertedIndex.appendIdempotent(spark, root,
      docs.filter(col("doc_id") % 3 === 1), batchId = 1L)
    val workload = graft.queries.Search.bm25BatchQueriesDf(spark)
    def batchResults() = InvertedIndex
      .probeBatch(spark, root, workload, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val probeBefore = results(root)
    val batchBefore = batchResults()
    def batchDirs(sub: String) = {
      val d = new java.io.File(s"$root/$sub")
      if (!d.exists()) Array.empty[java.io.File]
      else d.listFiles().filter(f =>
        f.isDirectory && f.getName.startsWith("batch="))
    }
    assert(batchDirs("postings_batches").length == 2)

    assert(InvertedIndex.compactBatches(spark, root) == Some(1L))
    assert(results(root) == probeBefore,
      "compaction changed single-probe results")
    assert(batchResults() == batchBefore,
      "compaction changed batched-probe results")
    assert(batchDirs("postings_batches").isEmpty &&
      batchDirs("corpus_batches").isEmpty,
      "folded batch directories must be deleted")
    assertTiles(root, 1)
    // compacting again with nothing new is a no-op
    assert(InvertedIndex.compactBatches(spark, root).isEmpty)

    // a replayed FOLDED batch id must not re-append (double-count)
    InvertedIndex.appendIdempotent(spark, root,
      docs.filter(col("doc_id") % 3 === 1), batchId = 1L)
    assert(batchDirs("postings_batches").isEmpty,
      "a folded batch id replay must be skipped, not re-appended")
    assert(results(root) == probeBefore)

    // the next drain lands on top of the fold...
    InvertedIndex.appendIdempotent(spark, root,
      docs.filter(col("doc_id") % 3 === 2), batchId = 2L)
    val exp = graft.queries.Search.t31_bm25.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(results(root) == exp,
      "post-compaction drain diverged from the inline full-corpus ranking")
    // ...and a second compaction folds ONLY the new batch into a new
    // generation (merging with the first only if the size-tiered
    // trigger fires) — either way the generations tile [0,2]
    assert(InvertedIndex.compactBatches(spark, root) == Some(2L))
    assert(results(root) == exp)
    assertTiles(root, 2)
  }

  test("a width-2 stream root drains, folds, and probes identically") {
    // The 100TB fan-out knob composed with the streaming layout: a
    // pre-written pfx_width widens every batch's directories, the fold
    // preserves them (256-dir compacted layout), and rankings stay
    // byte-identical to the width-1 inline query.
    val root = tmpDir("inv-width2-stream")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/pfx_width"),
      "2\n".getBytes("UTF-8"))
    InvertedIndex.appendIdempotent(spark, root,
      docs.filter(col("doc_id") % 2 === 0), batchId = 0L)
    InvertedIndex.appendIdempotent(spark, root,
      docs.filter(col("doc_id") % 2 =!= 0), batchId = 1L)
    val exp = graft.queries.Search.t31_bm25.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(results(root) == exp, "width-2 stream root diverged pre-fold")
    // batch dirs carry 2-hex-char pfx values
    val b0 = new java.io.File(s"$root/postings_batches/batch=0")
      .listFiles().filter(_.getName.startsWith("pfx=")).map(_.getName)
    assert(b0.nonEmpty && b0.forall(_.matches("pfx=x[0-9a-f]{2}")),
      s"expected width-2 pfx dirs: ${b0.take(3).mkString(",")}")
    assert(InvertedIndex.compactBatches(spark, root) == Some(1L))
    assert(results(root) == exp, "width-2 fold changed the ranking")
    val folded = new java.io.File(s"$root/compacted/gen-0-1/postings")
      .listFiles().filter(_.getName.startsWith("pfx=")).map(_.getName)
    assert(folded.nonEmpty && folded.forall(_.matches("pfx=x[0-9a-f]{2}")),
      "the fold must preserve the build's fan-out width")
  }

  test("compactBatches refuses a build-layout root") {
    val root = graft.operators.InvertedIndex.defaultRoot(sfDir)
    graft.operators.InvertedIndex.buildIfMissing(spark, sfDir, root)
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.compactBatches(spark, root)
    }
    assert(e.getMessage.contains("build layout"), e.getMessage)
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
