package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{vec_dot, vec_norm}

/** Ingestion-time routing for the EMBEDDING lane — the streaming twin of
  * the batch ANN index-build assignments: new vectors stream in (a
  * crawler emitting freshly-embedded documents) and each is routed, at
  * arrival time, to the index locations the batch queries would probe:
  *
  *  - its SRP bucket ([[graft.queries.Similarity.srpBucket]] — the SAME
  *    literal-plane projection s02 probes and `operators.AnnIndex`
  *    partitions by), and
  *  - its IVF cell (nearest centroid by the SAME rounded-cosine +
  *    tie-break contract as the batch `assignNearest` used by s03/s05
  *    and d09).
  *
  * Batch assignment ranks a k-row centroid broadcast with a window;
  * windows don't exist in streaming, so the twin folds the centroids
  * into ONE stateless projection: a `greatest(...)` over per-centroid
  * `struct(sim, -clabel)` structs — lexicographic struct max = highest
  * sim, ties to the smallest label, exactly the batch window's
  * (sim DESC, clabel ASC) first row. `SimilarityStreamSpec` proves the
  * streamed assignments are shard-independent and IDENTICAL to the
  * batch operator's on the same corpus.
  *
  * Scale shape: both assignments are stateless per-row expressions over
  * driver-side constants (the centroid table is k rows — the broadcast
  * model-serving pattern; the SRP planes are literals), so the stream
  * runs at scan speed with zero state store, and the routed output can
  * append straight into [[graft.operators.AnnIndex]]'s (bucket | cell)
  * partition layout — the streaming half of an always-fresh ANN index.
  */
object SimilarityStream {
  /** Add the SRP `bucket` column (stateless literal-plane projection). */
  def bucketAssign(emb: DataFrame): DataFrame =
    emb.withColumn("bucket",
      graft.queries.Similarity.srpBucket(col("embedding")))

  /** Nearest-centroid cosine assignment as one stateless expression.
    * `centroids` are collected rows of the batch centroid table
    * (clabel, cvec, cn) — k rows, the model side of a serving join.
    * Adds `clabel`; `norm` is computed and dropped internally. */
  def cellAssign(
      emb: DataFrame,
      centroids: Seq[(Int, Seq[Double], Double)]): DataFrame = {
    require(centroids.nonEmpty, "cellAssign needs at least one centroid")
    val scored: Seq[Column] = centroids.map { case (cl, cv, cn) =>
      struct(
        when(col("norm") > 0 && lit(cn) > 0,
          round(vec_dot(col("embedding"), array(cv.map(lit): _*)) /
            (col("norm") * lit(cn)), 6)).otherwise(0.0).as("sim"),
        lit(-cl).as("negl"))
    }
    val best =
      if (scored.size == 1) scored.head else greatest(scored: _*)
    emb.withColumn("norm", vec_norm(col("embedding")))
      .withColumn("clabel", -best.getField("negl"))
      .drop("norm")
  }
}
