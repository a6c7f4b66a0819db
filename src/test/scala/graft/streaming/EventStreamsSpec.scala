package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming results must equal their batch twins on the same input —
  * the invariant that makes AvailableNow micro-batching a drop-in for
  * the reference's cron ingestion. */
// excluded from the default `sbt test` (CI budget) — run with
// GRAFT_TEST_ALL=1 or `testOnly`; see build.sbt
@org.scalatest.tags.Slow
class EventStreamsSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  /** File-source streams read directories (files "arrive" in them). */
  private lazy val streamDir: String = {
    val dir = tmpDir("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(dir, "events-000.parquet"))
    dir
  }

  test("streaming hourly counts equal the batch aggregation") {
    val stream = EventStreams.readEvents(spark, streamDir)
    assert(stream.isStreaming)
    // Complete mode: Append would hold back windows newer than the final
    // watermark (they'd emit on the NEXT batch that never comes in a
    // drain-all run), so the full-result comparison needs Complete.
    EventStreams.drainToMemory(
      EventStreams.hourlyCounts(stream), "hourly_out", OutputMode.Complete())

    val got = spark.table("hourly_out")
      .orderBy("hour", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    val exp = Tables(spark, sfDir, "events")
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("hour", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    // watermark drops nothing here (single drained batch), so exact match
    assert(got.toSeq == exp.toSeq)
  }

  test("streaming dedup drops re-delivered events") {
    // deliver the same file twice => every event is duplicated once
    val dupDir = tmpDir("events-dup")
    for (i <- 0 to 1)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        java.nio.file.Paths.get(dupDir, s"delivery-$i.parquet"))
    val stream = EventStreams.readEvents(spark, dupDir)
    EventStreams.drainToMemory(
      EventStreams.dedupEvents(stream).groupBy("event_id")
        .count(), "dedup_out", OutputMode.Complete())
    val counts = spark.table("dedup_out")
    assert(counts.count() == 1000) // all distinct ids survive
    assert(counts.filter(org.apache.spark.sql.functions.col("count") > 1)
      .count() == 0) // no duplicate made it through
  }

  test("stream-stream interval join equals its batch twin") {
    val stream = EventStreams.readEvents(spark, streamDir)
    EventStreams.drainToMemory(
      EventStreams.purchasesAfterSignup(stream), "ssjoin_out",
      OutputMode.Append())
    val got = spark.table("ssjoin_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted

    val batch = Tables(spark, sfDir, "events")
    val exp = EventStreams.purchasesAfterSignup(
        batch.withColumn("ts", col("ts"))) // same logic, batch frame
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(got.toSeq == exp.toSeq && exp.nonEmpty)
  }

  test("raw zone streams incrementally as new pages arrive") {
    import graft.ingest._
    val root = tmpDir("raw-stream")
    val cfg = IngestConfig()
    RawWriter.write(spark, Planner.plan(spark, cfg, "2026-02-01"),
      MockFetcher(), root, tmpDir("q"))

    val counts = EventStreams.readRawZone(spark, root)
      .groupBy(org.apache.spark.sql.functions.col("source"))
      .count()
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("raw_stream_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("raw_stream_out").collect()
        .map(_.getLong(1)).sum == 40)

      // second ingestion date arrives: the stream picks it up
      RawWriter.write(spark, Planner.plan(spark, cfg, "2026-02-02"),
        MockFetcher(), root, tmpDir("q"))
      q.processAllAvailable()
      val after = spark.table("raw_stream_out").collect()
      assert(after.map(_.getLong(1)).sum == 80)
      assert(after.length == 4 && after.forall(_.getLong(1) == 20))
    } finally q.stop()
  }

  test("batch ≡ stream on every ts physical generation") {
    // The same logical log written as int64-nanos, TIMESTAMP_NTZ, and
    // TIMESTAMP_LTZ must produce identical hourly aggregates from BOTH
    // the batch loader and the file-source stream — so the twins can't
    // diverge on a branch of Tables.normalizeTs (the round-6 failure
    // mode, where only one generation was ever tested).
    val dirs = graft.EventFixtures.writeAll(spark, tmpDir)
    val results = dirs.map { case (gen, dir) =>
      val batch = Tables(spark, dir, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:00").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("hour", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq

      val stream = EventStreams.readEvents(spark, s"$dir/events.parquet")
      assert(stream.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"$gen: stream ts not normalized")
      EventStreams.drainToMemory(EventStreams.hourlyCounts(stream),
        s"hourly_gen_${gen.replace('-', '_')}", OutputMode.Complete())
      val streamed = spark.table(s"hourly_gen_${gen.replace('-', '_')}")
        .orderBy("hour", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq

      assert(streamed == batch, s"$gen: stream diverged from batch")
      gen -> batch
    }
    // and every generation decodes to the same instants
    assert(results.values.toSet.size == 1,
      s"generations disagree: ${results.keys.mkString(", ")}")
    assert(results.values.head.nonEmpty)
  }

  test("stateful sessionization equals the batch window query") {
    val stream = EventStreams.readEvents(spark, streamDir)
    EventStreams.drainToMemory(
      EventStreams.sessionize(stream).toDF(), "sessions_out", OutputMode.Update())

    val got = spark.table("sessions_out")
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val exp = graft.queries.Events.q15_sessionize.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    assert(got.toSeq == exp.toSeq)
  }
}
