package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming face of the engine.
  *
  * The reference has no true streaming engine — its "stream" is cron
  * micro-batches through SQS (stack.py:99-103, SURVEY §1). Here the same
  * analytics run incrementally: file-source -> watermark -> windowed aggs,
  * and custom session state via mapGroupsWithState. `Trigger.AvailableNow`
  * gives exactly the cron-batch semantics (drain what exists, stop), while
  * the identical plan runs continuously on a cluster.
  */
object EventStreams {
  /** Schema for streaming reads of the events table, parameterized on the
    * physical type `ts` was written with (int64 epoch-nanos → LongType;
    * timestamp[us] → TIMESTAMP_NTZ; or TIMESTAMP_LTZ). File-source
    * streams require an explicit schema, so the reader infers the actual
    * type from the files already present (see [[readEvents]]). */
  def rawSchema(tsType: DataType = TimestampNTZType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** File-source stream over a directory of events parquet.
    *
    * Streaming sources can't infer schemas, so peek at the files already
    * in `dir` with a batch read and adopt their `ts` physical type; the
    * stream then normalizes to session-zoned TimestampType exactly like
    * the batch loader ([[graft.core.Tables.normalizeTs]]), so batch and
    * stream can never diverge on a type branch. An empty/unreadable dir
    * falls back to TIMESTAMP_NTZ — the current testdata generation. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // No-op for µs/NTZ files; required before either the peek or the
    // stream can read TIMESTAMP(NANOS) files as raw longs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch {
        case scala.util.control.NonFatal(e) =>
          // The fallback is a GUESS (the current testdata generation),
          // and a stream bootstrapped against an empty dir that later
          // receives e.g. int64-nanos files would misread them against
          // this pinned schema. Say so loudly at declaration time — the
          // one moment the operator can still re-point the stream —
          // instead of failing obscurely mid-stream.
          System.err.println(
            s"[streams] WARNING: could not infer events schema from '$dir' " +
              s"(${e.getClass.getSimpleName}); pinning ts=TIMESTAMP_NTZ. " +
              "If files of a different ts generation arrive later, restart " +
              "the stream so the schema is re-inferred from real files.")
          TimestampNTZType
      }
    graft.core.Tables.normalizeTs(
      spark.readStream.schema(rawSchema(tsType)).parquet(dir))
  }

  /** Hourly tumbling counts per event type with a 1-hour watermark —
    * the streaming twin of queries.Events.q13. Late data beyond the
    * watermark is dropped; state is bounded by (watermark horizon x
    * #types), so this runs forever at any input rate. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n_events"), col("total_value"))

  final case class SessionState(lastTe: Long, sessions: Long, events: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful sessionization (30-min gap), the streaming twin of q15.
    * State per user is three longs — constant-size regardless of history,
    * the shape that survives unbounded streams. */
  def sessionize(events: DataFrame): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), unix_timestamp(col("ts")).as("te"),
        col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, UserSessions](
        GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { case (_, te, _) =>
            val newSession = st.lastTe == Long.MinValue || te - st.lastTe > 1800
            st = SessionState(te,
              st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          UserSessions(userId, st.sessions, st.events)
      }
  }

  /** Streaming exact-dedup (the streaming twin of dedup d01): drop
    * re-deliveries of the same event id within the watermark horizon.
    * State is one entry per id inside the horizon — bounded, unlike an
    * unwatermarked distinct. This is the idempotency guarantee of the
    * ingestion plane (worker.py:214-221) expressed over a stream. */
  def dedupEvents(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases matched to the same user's
    * signups within the last `withinHours` hours. Watermarks on both
    * sides + the time bound let Spark expire join state — without them a
    * stream-stream join buffers forever. Works identically on batch
    * frames (the test's oracle). */
  def purchasesAfterSignup(
      events: DataFrame, withinHours: Int = 24): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"),
        col("event_id").as("signup_id"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    purchases.join(signups,
      expr(s"""p_user = s_user AND p_ts >= s_ts
               AND p_ts <= s_ts + INTERVAL $withinHours HOURS"""))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("signup_id"))
  }

  /** Incremental raw-zone processing: a file-source stream over the
    * ingestion layout (gzipped JSON pages under
    * raw/source=X/ingestion_date=D/). New pages are picked up per
    * micro-batch — the streaming twin of the reference's 10-minute
    * crawler + 5-minute ingestion cron (stack.py:99-103,188). Partition
    * columns come from the directory layout exactly as in batch reads. */
  def readRawZone(spark: SparkSession, rawRoot: String): DataFrame = {
    val schema = graft.ingest.RawSchema.payload
      .add("source", StringType)
      .add("ingestion_date", StringType)
    spark.readStream
      .schema(schema)
      .option("compression", "gzip")
      .option("basePath", rawRoot)
      .json(s"$rawRoot/*/*")
  }

  /** Drain-all helper: run a streaming query to completion on existing
    * files (the cron-batch analog) into an in-memory table. */
  def drainToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
