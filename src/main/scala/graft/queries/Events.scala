package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Exact, Tables}

/** Event-stream analytics over the `events` table (batch form; the same
  * logic runs incrementally via Structured Streaming in
  * [[graft.streaming.EventStreams]]).
  *
  * Determinism notes: event timestamps are nanosecond-precision in parquet;
  * Spark reads them at microsecond precision (see [[Tables]]). Every query
  * therefore reduces time to second granularity (integer epoch) BEFORE any
  * ordering or arithmetic, so results are engine-independent.
  */
object Events {
  import Exact.dec

  val q13_events_hourly = Q(
    "q13_events_hourly",
    (s, dir) => {
      // Tumbling 1-hour windows: single shuffle on (hour, type); partial
      // aggregation makes this linear-scan-friendly at 100 TB.
      Tables(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")
            .as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("hour"), col("event_type"))
    },
    Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             event_type,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
             COUNT(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY 1, 2
      ORDER BY hour, event_type"""))

  val q15_sessionize = Q(
    "q15_sessionize",
    (s, dir) => {
      // Session = maximal run of a user's events with gaps <= 30 min.
      // One shuffle on user_id; lag + running count inside the partition.
      // Time reduced to integer seconds before sorting so tie-breaks match
      // any oracle engine regardless of sub-second precision.
      val ev = Tables(s, dir, "events")
        .select(
          col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("te"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("te"), col("event_id"))
      ev.withColumn("gap", col("te") - lag(col("te"), 1).over(w))
        .withColumn("new_session",
          when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(
          sum(col("new_session")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
             CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             COUNT(*) AS n_events
      FROM (
        SELECT user_id,
               CASE WHEN te - LAG(te) OVER (PARTITION BY user_id
                      ORDER BY te, event_id) > 1800
                    OR LAG(te) OVER (PARTITION BY user_id
                      ORDER BY te, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM (SELECT user_id, event_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS te FROM events))
      GROUP BY user_id
      ORDER BY user_id"""))

  val q17_pivot = Q(
    "q17_pivot",
    (s, dir) => {
      // Pivot with an explicit (closed) value list => no extra pass to
      // discover distinct keys, and a schema that's stable at any SF.
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(
        col("user_id") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  val q18_json_extract = Q(
    "q18_json_extract",
    (s, dir) => {
      // JSON scalar extraction from the props column (codegen'd built-in,
      // no UDF): distribution of props.k by event_type.
      Tables(s, dir, "events")
        .select(
          col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             CAST(MIN(k) AS BIGINT) AS min_k,
             CAST(MAX(k) AS BIGINT) AS max_k
      FROM (SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events)
      GROUP BY event_type
      ORDER BY event_type"""))

  val all: Seq[Q] = Seq(q13_events_hourly, q15_sessionize, q17_pivot,
    q18_json_extract)
}
