package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import graft.functions.VectorFunctions.vec_norm
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streamed index routing ≡ batch assignment on the same corpus: the
  * window-free greatest(struct(sim, -clabel)) fold must pick EXACTLY
  * the centroid the batch crossJoin+window assignment picks (same
  * rounded-cosine, same tie-break), and the SRP bucket projection must
  * be shard- and arrival-order-independent — the properties that let an
  * ANN index ingest new vectors at arrival time. */
class SimilarityStreamSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("sharded streaming routes vectors exactly as the batch assigners") {
    import spark.implicits._
    val emb = Tables(spark, sfDir, "embeddings")
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val cents = graft.queries.Similarity.labelCentroids(spark, sfDir)
      .as[(Int, Seq[Double], Double)].collect().toSeq
    assert(cents.size > 1, "needs several centroids to discriminate")

    // three uneven shards, arrival order unlike vec_id order
    val shards = rows.groupBy(d => (d._1 % 3).toInt).toSeq
      .sortBy(-_._1).map(_._2)
    val input = MemoryStream[(Long, Seq[Float])](spark, 1)
    val routed = SimilarityStream.cellAssign(
      SimilarityStream.bucketAssign(
        input.toDF().toDF("vec_id", "embedding")),
      cents)
    val q = routed.select("vec_id", "bucket", "clabel").writeStream
      .format("memory").queryName("sim_route_out")
      .outputMode(OutputMode.Append).start()
    try {
      shards.foreach { sh => input.addData(sh); q.processAllAvailable() }
      val streamed = spark.table("sim_route_out")
        .as[(Long, Long, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed.size == rows.size)

      // batch twins: s02's bucket projection and s03/s05/d09's
      // window-based nearest-centroid assignment
      val batch = graft.queries.Similarity.assignNearest(
        emb.select(col("vec_id"), col("embedding"),
          vec_norm(col("embedding")).as("norm")),
        graft.queries.Similarity.labelCentroids(spark, sfDir))
        .withColumn("bucket",
          graft.queries.Similarity.srpBucket(col("embedding")))
        .select(col("vec_id"), col("bucket"), col("clabel"))
        .as[(Long, Long, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed == batch,
        "streamed routing diverged from the batch assigners")
      // the assignment actually uses multiple cells (not degenerate)
      assert(streamed.values.map(_._2).toSet.size > 1)
      assert(streamed.values.map(_._1).toSet.size > 1)
    } finally { q.stop() }
  }
}
