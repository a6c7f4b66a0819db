package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming transition facts ≡ batch q54 on the same event log: the
  * events streamed through uneven time shards must aggregate to exactly
  * the batch transition matrix, including same-second ties and
  * transitions that span a shard boundary (stitched via carried state). */
// excluded from the default `sbt test` (CI budget) — run with
// GRAFT_TEST_ALL=1 or `testOnly`; see build.sbt
@org.scalatest.tags.Slow
class TransitionStreamSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("sharded streaming transitions aggregate to the batch q54 matrix") {
    import spark.implicits._
    val events = Tables(spark, sfDir, "events")
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    // three consecutive time shards (the log-shipping arrival order:
    // per-user sequence order is preserved ACROSS shards), scrambled
    // WITHIN each shard (arrival order inside a trigger is arbitrary)
    val ordered = events.sortBy(e => (e._2.getTime / 1000, e._3))
    val shards = ordered.grouped((ordered.size + 2) / 3).toSeq
      .map(sh => scala.util.Random.shuffle(sh))

    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)](spark, 1)
    val stream = TransitionStream.transitions(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type"))
    val q = stream.writeStream
      .format("memory").queryName("trans_out")
      .outputMode(OutputMode.Append).start()
    try {
      shards.foreach { sh => input.addData(sh); q.processAllAvailable() }
      val streamed = spark.table("trans_out")
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_trans"))
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap

      val batch = graft.queries.EventAnalytics2.q54_event_transitions
        .run(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        s"streamed size=${streamed.size} batch size=${batch.size}")
      assert(batch.valuesIterator.sum > 100, "tiny matrix; weak test")
    } finally { q.stop() }
  }

  test("file-source transitions ≡ batch q54 on every ts generation") {
    // Same logical log in all three ts physical generations: the
    // streaming transition facts fed from EventStreams.readEvents must
    // aggregate to the batch q54 matrix on EACH, so the type branches in
    // Tables.normalizeTs can never split the twins.
    import spark.implicits._
    val dirs = graft.EventFixtures.writeAll(spark, tmpDir)
    val matrices = dirs.map { case (gen, dir) =>
      val name = s"trans_gen_${gen.replace('-', '_')}"
      val stream = TransitionStream.transitions(
        EventStreams.readEvents(spark, s"$dir/events.parquet")
          .selectExpr("user_id", "ts", "event_id", "event_type"))
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      val streamed =
        try {
          q.processAllAvailable()
          spark.table(name)
            .groupBy(col("from_type"), col("to_type"))
            .agg(count(lit(1)).as("n_trans"))
            .as[(String, String, Long)].collect()
            .map(r => (r._1, r._2) -> r._3).toMap
        } finally q.stop()

      val batch = graft.queries.EventAnalytics2.q54_event_transitions
        .run(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch, s"$gen: stream diverged from batch q54")
      gen -> batch
    }
    assert(matrices.values.toSet.size == 1,
      s"generations disagree: ${matrices.keys.mkString(", ")}")
    assert(matrices.values.head.valuesIterator.sum > 10)
  }

  test("streaming transition facts + TopKPerKey reproduce batch q55") {
    // The capped-matrix variant's streaming twin: drain transition facts
    // from the real event log (shard-ordered, scrambled within shards —
    // same protocol as the q54 twin), aggregate, then apply the native
    // TopKPerKey exactly as batch q55 does. At scale the drained
    // aggregate is the |observed (from,to)| relation, so the top-k pass
    // costs the same bounded shuffle either way.
    import spark.implicits._
    val events = Tables(spark, sfDir, "events")
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    val ordered = events.sortBy(e => (e._2.getTime / 1000, e._3))
    val shards = ordered.grouped((ordered.size + 1) / 2).toSeq
      .map(sh => scala.util.Random.shuffle(sh))
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)](spark, 1)
    val stream = TransitionStream.transitions(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type"))
    val q = stream.writeStream.format("memory").queryName("trans_topk")
      .outputMode(OutputMode.Append).start()
    val streamed =
      try {
        shards.foreach { sh => input.addData(sh); q.processAllAvailable() }
        val agg = spark.table("trans_topk")
          .groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n_trans"))
        org.apache.spark.sql.graft.TopKPerKey(agg,
          keys = Seq(col("from_type")),
          order = Seq(col("n_trans").desc, col("to_type").asc), k = 2)
          .orderBy(col("from_type"), col("n_trans").desc, col("to_type"))
          .as[(String, String, Long)].collect().toSeq
      } finally q.stop()
    val batch = graft.queries.EventAnalytics2.q55_top_transitions
      .run(spark, sfDir).as[(String, String, Long)].collect().toSeq
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    assert(batch.nonEmpty)
  }

  test("a transition spanning two triggers is emitted exactly once") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)](spark, 1)
    val stream = TransitionStream.transitions(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type"))
    val q = stream.writeStream
      .format("memory").queryName("trans_span")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq((1L, ts(1), 1L, "A")))
      q.processAllAvailable()
      input.addData(Seq((1L, ts(2), 2L, "B")))
      q.processAllAvailable()
      val got = spark.table("trans_span")
        .as[(Long, String, String)].collect().toSeq
      assert(got == Seq((1L, "A", "B")), s"got $got")
    } finally { q.stop() }
  }
}
