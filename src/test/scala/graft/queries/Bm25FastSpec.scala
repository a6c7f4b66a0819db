package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The float BM25 fast path must rank EXACTLY like the oracle-gated
  * exact-integer path — same top-k set, same order (score values are
  * allowed to differ in representation; ranks are the product). The
  * exact path is hash-matched against DuckDB at every SF, so rank
  * equality here anchors the fast path externally by transitivity. */
class Bm25FastSpec extends SparkSpec {

  private def ranks(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("doc_id"), col("n_terms")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
    test(s"inline fast path ranks identically to the exact path at $sf") {
      val docs = Tables(spark, s"/root/testdata/$sf", "documents")
      val exact = ranks(Search.t31_bm25.run(spark, s"/root/testdata/$sf"))
      val fast = ranks(Search.bm25Fast(docs))
      assert(exact.nonEmpty, "empty ranking; weak test")
      assert(fast == exact,
        s"fast path diverged at $sf:\n fast=$fast\n exact=$exact")
    }
  }

  test("index-served fast probe ranks identically to the exact probe") {
    val sfDir = "/root/testdata/sf0.001"
    val root = graft.operators.InvertedIndex.defaultRoot(sfDir)
    graft.operators.InvertedIndex.buildIfMissing(spark, sfDir, root)
    val exact = ranks(graft.operators.InvertedIndex
      .probe(spark, root, Search.Bm25Terms))
    val fast = ranks(graft.operators.InvertedIndex
      .probeFast(spark, root, Search.Bm25Terms))
    assert(exact.nonEmpty && fast == exact,
      s"index fast probe diverged:\n fast=$fast\n exact=$exact")
  }

  test("index-served batched fast probe ranks like the exact batch probe") {
    val sfDir = "/root/testdata/sf0.001"
    val root = graft.operators.InvertedIndex.defaultRoot(sfDir)
    graft.operators.InvertedIndex.buildIfMissing(spark, sfDir, root)
    val w = Search.bm25BatchQueriesDf(spark)
    def perQuery(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = perQuery(graft.operators.InvertedIndex
      .probeBatch(spark, root, w, Search.Bm25BatchK))
    val fast = perQuery(graft.operators.InvertedIndex
      .probeBatchFast(spark, root, w, Search.Bm25BatchK))
    assert(exact.nonEmpty && fast == exact,
      s"batched fast probe diverged (first 10): ${fast.take(10)} vs " +
        s"${exact.take(10)}")
  }

  test("batched fast path ranks every workload query like the exact batch") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables(spark, sfDir, "documents")
    val base = Search.tokenized(docs)
      .select(col("doc_id"), col("dl"), col("toks")).cache()
    val corpus = base.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val q = Search.bm25BatchQueriesDf(spark)
      .select(col("query_id"), col("tok")).distinct()
    val tfq = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .join(broadcast(q.select(col("tok")).distinct()), "tok")
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfStats = tfq.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    def perQuery(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = perQuery(
      Search.bm25ScoreBatch(tfq, q, dfStats, corpus, Search.Bm25BatchK))
    val fast = perQuery(
      Search.bm25ScoreBatchFast(tfq, q, dfStats, corpus,
        Search.Bm25BatchK))
    base.unpersist(false)
    assert(exact.nonEmpty && fast == exact,
      s"batched fast path diverged (first 10): fast=${fast.take(10)} " +
        s"exact=${exact.take(10)}")
  }
}
