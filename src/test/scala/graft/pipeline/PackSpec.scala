package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** The packing manifest must be a complete, non-overlapping tiling:
  * every bin except each source's last holds exactly ctx tokens, every
  * document's segments reconstruct it in order exactly once, and the
  * whole thing is deterministic — the contract a training loader
  * assembles batches from. */
class PackSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private val ctx = 256L

  private def base = Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("source"),
      expr("CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT)")
        .as("n_tok"))

  test("every bin except each source's last holds exactly ctx tokens") {
    import spark.implicits._
    val perBin = Pack.segments(base, ctx)
      .groupBy(col("source"), col("bin"))
      .agg(sum(col("tok_to") - col("tok_from")).as("toks"))
    val lastBin = perBin.groupBy(col("source"))
      .agg(max(col("bin")).as("last"))
    val short = perBin.join(lastBin, "source")
      .filter(col("bin") < col("last") && col("toks") =!= ctx)
      .count()
    assert(short == 0, s"$short interior bins are not exactly $ctx tokens")
    // last bins: non-empty, never overfull
    val bad = perBin.join(lastBin, "source")
      .filter(col("bin") === col("last") &&
        (col("toks") <= 0 || col("toks") > ctx)).count()
    assert(bad == 0)
    // bins are contiguous from 0 per source
    val holes = perBin.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), min(col("bin")).as("mn"),
        max(col("bin")).as("mx"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count()
    assert(holes == 0, "bin ids are not contiguous from 0")
  }

  test("segments reconstruct every document exactly once, in order") {
    val segs = Pack.segments(base, ctx)
    // total tokens per doc match, ranges start at 0 and end at n_tok
    val perDoc = segs.groupBy(col("doc_id"))
      .agg(sum(col("tok_to") - col("tok_from")).as("covered"),
        min(col("tok_from")).as("mn"), max(col("tok_to")).as("mx"),
        count(lit(1)).as("n_segs"))
      .join(base.filter(col("n_tok") > 0), "doc_id")
    assert(perDoc.filter(col("covered") =!= col("n_tok") ||
      col("mn") =!= 0 || col("mx") =!= col("n_tok")).count() == 0,
      "segment ranges do not tile documents")
    // non-overlap: per (doc, bin) a single segment, and coverage == span
    assert(segs.groupBy(col("doc_id"), col("bin"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count() == 0)
    // every doc with tokens appears
    assert(perDoc.count() == base.filter(col("n_tok") > 0).count())
  }

  test("manifest write is shard-partitioned and round-trips") {
    val out = tmpDir("pack-manifest")
    Pack.writeManifest(base, ctx, binsPerShard = 2L, out)
    val back = spark.read.parquet(out)
    val direct = Pack.segments(base, ctx)
      .withColumn("shard", expr("bin DIV 2"))
    assert(back.count() == direct.count())
    assert(back.select("source", "bin", "doc_id", "tok_from", "tok_to", "shard")
      .except(direct.select("source", "bin", "doc_id", "tok_from", "tok_to",
        "shard")).isEmpty)
    // physical layout: source=.../shard=... directories exist
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("shard=")))
  }

  test("deterministic: two runs produce the identical manifest") {
    val a = Pack.segments(base, ctx).collect().toSet
    val b = Pack.segments(base, ctx).collect().toSet
    assert(a == b)
  }
}
