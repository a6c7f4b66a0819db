package graft.core

import graft.SparkSpec
import graft.lake.Snapshots
import org.apache.spark.sql.functions._

/** Snapshot-aware table resolution: `spark.graft.snapshot.<table>`
  * pins a lane table to an immutable [[Snapshots]] version, so the SAME
  * query is byte-stable across later commits — "train on v12" as
  * config, closing the loop between the snapshot layer and the query
  * pack. */
class SnapshotReadSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def unpin(): Unit =
    spark.conf.unset("spark.graft.snapshot.documents")

  test("a pinned lane query is byte-stable across later commits") {
    val root = tmpDir("snap-read")
    val docs = Tables(spark, sfDir, "documents")
    val v1 = Snapshots.overwrite(spark, root, docs)
    assert(v1 == 1)
    try {
      spark.conf.set("spark.graft.snapshot.documents", s"$root@v1")
      // an unchanged PACK query now reads the snapshot
      val pinned = graft.queries.Text.t12_source_mix.run(spark, sfDir)
        .collect().toSeq
      val live = { unpin()
        val r = graft.queries.Text.t12_source_mix.run(spark, sfDir)
          .collect().toSeq
        spark.conf.set("spark.graft.snapshot.documents", s"$root@v1")
        r
      }
      assert(pinned == live, "v1 == the live table at commit time")
      // the corpus moves on: v2 halves the corpus — the pinned query
      // must NOT see it
      Snapshots.overwrite(spark, root, docs.filter(col("doc_id") % 2 === 0))
      assert(graft.queries.Text.t12_source_mix.run(spark, sfDir)
        .collect().toSeq == pinned,
        "a later commit changed a version-pinned query's result")
      // @latest tracks the newest version
      spark.conf.set("spark.graft.snapshot.documents", s"$root@latest")
      val latest = Tables(spark, sfDir, "documents").count()
      assert(latest == docs.count() / 2 + docs.count() % 2,
        s"@latest should read v2's halved corpus, got $latest")
    } finally unpin()
    // unpinned: the live table again
    assert(Tables(spark, sfDir, "documents").count() ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
  }

  test("a malformed binding fails loudly, not as a silent fallback") {
    try {
      spark.conf.set("spark.graft.snapshot.documents", "no-version-here")
      val e = intercept[IllegalArgumentException] {
        Tables(spark, sfDir, "documents")
      }
      assert(e.getMessage.contains("snapshot binding"))
    } finally unpin()
  }
}
