package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The d06 block-size cap: a degenerate label (one giant "unknown"
  * bucket) must sub-split instead of going quadratic, without losing
  * true near-duplicate pairs. */
class DedupCapSpec extends SparkSpec {

  /** 1200 random vectors in one degenerate label + 50 in a healthy one,
    * plus 10 exact-duplicate copies of the first 10 vectors. */
  private lazy val skewed: DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(16)(rng.nextFloat() * 2f - 1f)
    val big = (0L until 1200L).map(i => (i, 0, vec()))
    val small = (1500L until 1550L).map(i => (i, 1, vec()))
    val dups = (0 until 10).map(i => (2000L + i, 0, big(i)._3))
    (big ++ small ++ dups).toDF("vec_id", "label", "embedding")
  }

  test("oversized label sub-splits; small label keeps sub = 0") {
    val sub = Dedup.withSubBlock(skewed, maxBlock = 64)
      .groupBy(col("label"), col("sub")).agg(count(lit(1)).as("n"))
      .collect()
    val bigBlocks = sub.filter(_.getInt(0) == 0)
    val smallBlocks = sub.filter(_.getInt(0) == 1)
    assert(bigBlocks.length > 1, "degenerate label was not sub-split")
    val maxBig = bigBlocks.map(_.getLong(2)).max
    assert(maxBig < 600,
      s"sub-splitting left a near-quadratic block of $maxBig rows")
    assert(smallBlocks.map(_.getLong(1)).toSet == Set(0L),
      "under-cap label must keep sub = 0 (results byte-identical)")
  }

  test("exact duplicates always survive the cap (SRP split preserves them)") {
    val pairs = Dedup.embedNearDupPairs(skewed, maxBlock = 64)
      .filter(col("cos_sim") === 1.0)
      .select("a_id", "b_id").as[(Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toSet
    (0 until 10).foreach { i =>
      assert(pairs.contains((i.toLong, 2000L + i)),
        s"exact duplicate pair ($i, ${2000 + i}) lost by the block cap")
    }
  }

  test("capped candidate pairs are a subset of the uncapped join") {
    val capped = Dedup.embedNearDupPairs(skewed, maxBlock = 64)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.embedNearDupPairs(skewed, maxBlock = 1 << 20)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    assert(capped.size < uncapped.size,
      "cap did not reduce the candidate set on a degenerate label")
  }

  test("driver-side SRP planes match the oracle's SQL formula") {
    val fromSql = spark.range(8).toDF("p")
      .crossJoin(spark.range(64).toDF("d"))
      .withColumn("w",
        (expr("CAST(conv(substr(md5(concat(p, '_', d)), 1, 8), 16, 10) AS BIGINT)")
          % 2001 - 1000).cast("double") / 1000.0)
      .orderBy(col("p"), col("d"))
      .collect().map(_.getDouble(2))
    val fromScala = Similarity.planes.flatMap(_._2)
    assert(fromScala == fromSql.toSeq)
  }
}
