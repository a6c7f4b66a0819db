package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The persisted LSH index must answer incremental probes with exactly
  * the batch d04 candidate semantics, while scanning only the probed
  * (band, prefix) partitions. */
class DedupIndexSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val root: String = {
    val r = tmpDir("dedup-index")
    DedupIndex.buildIfMissing(spark, sfDir, r)
    r
  }

  private def probeDf = {
    val probes = graft.queries.Dedup.bandedWithSigFromText(
      Tables(spark, sfDir, "documents").filter(col("doc_id") % 20 < 2)
        .select(col("doc_id"), col("text")))
    DedupIndex.probe(spark, root, probes)
  }

  test("probe equals the batch d04 candidates touching the probe set") {
    val got = probeDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // batch expectation: d04 pairs (a < b) re-oriented so the probe side
    // is q — a probe doc can be either end of a batch pair
    val d04 = graft.queries.Dedup.d04_lsh_pairs.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exp = (d04.filter(_._1 % 20 < 2).map(p => (p._1, p._2, p._3)) ++
      d04.filter(_._2 % 20 < 2).map(p => (p._2, p._1, p._3))).toSet
    assert(got == exp, s"probe=${got.size} batch=${exp.size}")
    assert(got.nonEmpty, "no probe candidates at smoke scale; weak test")
  }

  test("the probe scan prunes to the probed (band, prefix) partitions") {
    val df = probeDf
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the index scan (Location .../bands) must carry a NON-EMPTY
    // PartitionFilters list (the IN-over-concat references only the
    // partition columns, so it lands there, not in DataFilters)
    assert("bands\\], PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"no partition filter on the index scan:\n$plan")
    // the pruned scan must read strictly fewer files than the index holds
    val idxFiles = new java.io.File(s"$root/bands").listFiles()
    assert(idxFiles != null && idxFiles.count(_.getName.startsWith("band=")) == 4)
  }

  test("compactFiles: probe-identical fold, files collapse, appends continue") {
    // The third index's growth axis is FILES per (band, pfx) directory
    // (append adds up to one per dir per batch). compactFiles folds
    // the append zone into a fresh generation with ONE file per
    // directory; because the index is a bag and probe ends in
    // distinct(), every crash window is probe-identical by
    // construction — pinned below by manufacturing the
    // publish-before-cleanup state (rows in BOTH the fold and the
    // append zone).
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val r = tmpDir("dedup-compact-root")
    DedupIndex.append(spark, r, docs.filter(col("doc_id") % 3 === 0))
    DedupIndex.append(spark, r, docs.filter(col("doc_id") % 3 === 1))
    val probes = graft.queries.Dedup.bandedWithSigFromText(
      docs.filter(col("doc_id") % 20 < 2))
    def results() = DedupIndex.probe(spark, r, probes).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    def parquetFiles(dir: String): Int = {
      val d = new java.io.File(dir)
      if (!d.exists()) 0
      else d.listFiles().map { f =>
        if (f.isDirectory) parquetFiles(f.getPath)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      }.sum
    }
    val before = results()
    val filesBefore = parquetFiles(s"$r/bands")
    assert(filesBefore > 64, s"two appends should exceed 64 files: $filesBefore")

    assert(DedupIndex.compactFiles(spark, r) == Some(0L))
    assert(results() == before, "compaction changed probe results")
    assert(parquetFiles(s"$r/bands") == 0, "append zone should be empty")
    val foldedFiles = parquetFiles(s"$r/compacted/gen-0-0")
    assert(foldedFiles <= 64, s"fold should be <=1 file/dir: $foldedFiles")
    assert(DedupIndex.compactFiles(spark, r).isEmpty, "nothing new to fold")

    // the publish-before-cleanup crash window: the SAME rows live in
    // the fold AND the append zone — probe must collapse, not double
    DedupIndex.append(spark, r, docs.filter(col("doc_id") % 3 === 1))
    assert(results() == before,
      "double representation across fold + append zone leaked into probe")

    // post-fold appends land; the index equals a one-shot full build
    DedupIndex.append(spark, r, docs.filter(col("doc_id") % 3 === 2))
    val fullDir = tmpDir("dedup-compact-full")
    docs.coalesce(1).write.parquet(s"$fullDir/documents.parquet")
    val rootFull = tmpDir("dedup-compact-fullroot")
    DedupIndex.buildIfMissing(spark, fullDir, rootFull)
    val full = DedupIndex.probe(spark, rootFull, probes).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(results() == full,
      "post-compaction appends diverged from a full rebuild")
    // second fold lands as a new generation (merged with the first
    // only if the size-tiered trigger fires); either way the live
    // generations tile [0,1] and the probe set is unchanged
    assert(DedupIndex.compactFiles(spark, r) == Some(1L))
    assert(results() == full)
    val rs = Option(new java.io.File(s"$r/compacted").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName)
      .collect { case n if n.matches("gen-\\d+-\\d+") =>
        val p = n.stripPrefix("gen-").split("-")
        (p(0).toLong, p(1).toLong)
      }.toSeq.sortBy(_._1)
    assert(rs.head._1 == 0 && rs.last._2 == 1 &&
      rs.zip(rs.tail).forall { case (a, b) => b._1 == a._2 + 1 },
      s"generations must tile [0,1]: $rs")
  }

  test("rebuild is idempotent: second build is a no-op, probes unchanged") {
    val before = probeDf.collect().length
    val marker = new java.io.File(s"$root/bands/_SUCCESS")
    val mtime = marker.lastModified()
    DedupIndex.buildIfMissing(spark, sfDir, root)
    assert(marker.lastModified() == mtime, "index was rebuilt in place")
    assert(probeDf.collect().length == before)
  }

  test("append merges a delta exactly like a full rebuild") {
    // Split the corpus: base (doc_id % 10 != 0) indexed up front, delta
    // (doc_id % 10 == 0) appended incrementally. The merged index must
    // answer every probe identically to an index built from the full
    // corpus in one shot — the equivalence that makes incremental
    // maintenance safe at intake-pipeline scale.
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val baseDir = tmpDir("idx-base")
    val fullDir = tmpDir("idx-full")
    docs.filter(col("doc_id") % 10 =!= 0)
      .coalesce(1).write.parquet(s"$baseDir/documents.parquet")
    docs.coalesce(1).write.parquet(s"$fullDir/documents.parquet")

    val rootInc = tmpDir("idx-inc-root")
    DedupIndex.buildIfMissing(spark, baseDir, rootInc)
    DedupIndex.append(spark, rootInc, docs.filter(col("doc_id") % 10 === 0))
    val rootFull = tmpDir("idx-full-root")
    DedupIndex.buildIfMissing(spark, fullDir, rootFull)

    // probe with a mix of base and delta docs
    val probes = graft.queries.Dedup.bandedWithSigFromText(
      docs.filter(col("doc_id") % 20 < 2))
    def results(root: String) =
      DedupIndex.probe(spark, root, probes).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = results(rootInc)
    val full = results(rootFull)
    assert(inc == full,
      s"merged index diverged from rebuild: inc=${inc.size} full=${full.size}")
    assert(inc.nonEmpty, "no candidates at smoke scale; weak test")
    // and the delta actually contributed: some candidate is a delta doc
    assert(inc.exists(p => p._2 % 10 == 0),
      "no appended document ever surfaced as a candidate")
  }
}
