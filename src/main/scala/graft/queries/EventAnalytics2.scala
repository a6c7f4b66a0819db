package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Exact, Tables}

/** Product-analytics patterns over the events stream: funnels, retention
  * cohorts, histograms, exact distributed medians. */
object EventAnalytics2 {
  import Exact.dec

  val q29_funnel = Q(
    "q29_funnel",
    (s, dir) => {
      // Ordered conversion funnel signup -> view -> purchase per user:
      // stage timestamps are the user's first event of each type, a stage
      // counts only if it happens at-or-after the previous one. One
      // shuffle on user_id; the funnel matrix is k rows regardless of
      // event volume.
      val ev = Tables(s, dir, "events").select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("te"))
      val stages = ev.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "signup", col("te"))).as("t_signup"),
        min(when(col("event_type") === "view", col("te"))).as("t_view"),
        min(when(col("event_type") === "purchase", col("te"))).as("t_purchase"))
      stages.agg(
        count(col("t_signup")).as("n_signup"),
        count(when(col("t_view") >= col("t_signup"), 1)).as("n_signup_view"),
        count(when(col("t_view") >= col("t_signup") &&
          col("t_purchase") >= col("t_view"), 1)).as("n_full_funnel"))
    },
    Some("""
      SELECT COUNT(t_signup) AS n_signup,
             COUNT(CASE WHEN t_view >= t_signup THEN 1 END) AS n_signup_view,
             COUNT(CASE WHEN t_view >= t_signup AND t_purchase >= t_view
                   THEN 1 END) AS n_full_funnel
      FROM (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
               MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
        FROM events
        GROUP BY user_id)"""))

  val q30_retention = Q(
    "q30_retention",
    (s, dir) => {
      // Weekly retention cohorts: users grouped by first-seen week,
      // counted by weeks-since-cohort of later activity. Integer week
      // arithmetic on epoch days — identical on any engine.
      val ev = Tables(s, dir, "events").select(
        col("user_id"),
        floor(unix_timestamp(col("ts")) / lit(604800L)).as("week"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("weeks_since"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("weeks_since"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id,
               CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS week
        FROM events),
      cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id)
      SELECT cohort_week, week - cohort_week AS weeks_since,
             COUNT(DISTINCT ev.user_id) AS n_users
      FROM ev JOIN cohort USING (user_id)
      GROUP BY cohort_week, weeks_since
      ORDER BY cohort_week, weeks_since"""))

  val q31_histogram = Q(
    "q31_histogram",
    (s, dir) => {
      // Fixed-width histogram by integer bucket arithmetic (portable,
      // unlike engine-specific width_bucket variants): order totalprice
      // in 50k buckets.
      Tables(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"))
        .agg(
          count(lit(1)).as("n_orders"),
          Exact.money(sum(dec(col("o_totalprice")))).as("bucket_total"))
        .orderBy(col("bucket"))
    },
    Some("""
      SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
             COUNT(*) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(30,4)) AS DOUBLE) AS bucket_total
      FROM orders
      GROUP BY bucket
      ORDER BY bucket"""))

  val q32_exact_median = Q(
    "q32_exact_median",
    (s, dir) => {
      // Exact distributed median per group via rank selection: pick the
      // middle row(s) by row_number and average them — integer logic plus
      // one exact division, so every engine agrees (interpolating
      // percentile() implementations differ). One shuffle + in-partition
      // sort; no global materialization.
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("c_mktsegment"))))
        .filter(expr("rn = (n + 1) div 2 OR rn = n div 2 + 1"))
        .groupBy(col("c_mktsegment"))
        .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
          .as("median_acctbal"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS median_acctbal
      FROM (
        SELECT c_mktsegment, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey) AS rn,
               COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
        FROM customer)
      WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  val q54_event_transitions = Q(
    "q54_event_transitions",
    (s, dir) => {
      // First-order Markov transition matrix over per-user event
      // sequences: for every ordered pair of consecutive events by the
      // same user, count (from_type -> to_type) and normalize per
      // from_type — the behavioural fingerprint product analytics uses
      // for next-action prediction and bot detection (a scraper's
      // transition matrix is near-deterministic; a human's is diffuse).
      //
      // Shape: ONE shuffle on user_id for the lead() window (user
      // cardinality is corpus-scale, so the window parallelizes across
      // users; no per-user skew beyond a user's own event count), then
      // a grouped count whose result is |event_types|^2 rows — bounded
      // by the type vocabulary, not the event volume — so the final
      // normalization window over from_type runs on a dimension-sized
      // relation. Partial map-side counts do the heavy lifting.
      //
      // Determinism: ordering reduces ts to integer seconds first
      // (Spark reads the ns parquet at us, DuckDB at ns — raw ts order
      // could differ sub-second) with event_id as the unique tie-break;
      // the probability is one IEEE division of identical long operands
      // on both engines, rounded for the hash.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_timestamp(col("ts")), col("event_id"))
      val trans = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      trans
        .withColumn("n_from",
          sum(col("n_trans")).over(Window.partitionBy(col("from_type"))))
        .select(col("from_type"), col("to_type"), col("n_trans"),
          round(col("n_trans").cast("double") /
            col("n_from").cast("double"), 6).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""
      WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                 PARTITION BY user_id
                 ORDER BY epoch_ns(ts) // 1000000000, event_id) AS to_type
        FROM events),
      trans AS (
        SELECT event_type AS from_type, to_type,
               CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY 1, 2)
      SELECT from_type, to_type, n_trans,
             round(CAST(n_trans AS DOUBLE) /
                   CAST(SUM(n_trans) OVER (PARTITION BY from_type)
                        AS DOUBLE), 6) AS p
      FROM trans
      ORDER BY from_type, to_type"""))

  val q55_top_transitions = Q(
    "q55_top_transitions",
    (s, dir) => {
      // q54's transition matrix is |observed (from,to) pairs| rows —
      // bounded by |types|² but, with a parameterized event vocabulary
      // (screen names, deep-link routes), that bound is event-volume-
      // scale. Consumers of "what follows X" want the top-k successors
      // per from_type, so cap the matrix with the native TopKPerKey
      // operator: map-side partial top-k means at most k rows per
      // (from_type, input partition) ever shuffle, and the result is
      // |types|·k regardless of vocabulary size. Deterministic
      // tie-break: count desc, then to_type asc.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_timestamp(col("ts")), col("event_id"))
      val trans = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      org.apache.spark.sql.graft.TopKPerKey(
        trans,
        keys = Seq(col("from_type")),
        order = Seq(col("n_trans").desc, col("to_type").asc),
        k = 2)
        .orderBy(col("from_type"), col("n_trans").desc, col("to_type"))
    },
    Some("""
      WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                 PARTITION BY user_id
                 ORDER BY epoch_ns(ts) // 1000000000, event_id) AS to_type
        FROM events),
      trans AS (
        SELECT event_type AS from_type, to_type,
               CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY 1, 2)
      SELECT from_type, to_type, n_trans FROM (
        SELECT from_type, to_type, n_trans,
               ROW_NUMBER() OVER (PARTITION BY from_type
                 ORDER BY n_trans DESC, to_type) AS rk
        FROM trans)
      WHERE rk <= 2
      ORDER BY from_type, n_trans DESC, to_type"""))

  val q56_session_stats = Q(
    "q56_session_stats",
    (s, dir) => {
      // Session-duration distribution: q15's 30-min-gap sessionization,
      // extended with a running session id (cumulative sum of the
      // new-session flag inside the same user window — NO extra
      // shuffle), per-session duration/size aggregates on the
      // (user, session) grain, then a rollup to five fixed duration
      // buckets. Output is 5 rows regardless of event volume.
      //
      // Shape at 100 TB: one user_id exchange feeds the lag window, the
      // session-id running sum, AND the (user_id, session_id) partial
      // aggregate (all co-partitioned); only per-session 3-long tuples
      // reach the bucket rollup. Durations are integer seconds end to
      // end — every engine agrees; the single division is rounded.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("te"), col("event_id"))
      val sessions = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("te"))
        .withColumn("gap", col("te") - lag(col("te"), 1).over(w))
        .withColumn("new_session",
          when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg((max(col("te")) - min(col("te"))).as("dur_sec"),
          count(lit(1)).as("n_ev"))
      sessions
        .withColumn("dur_bucket",
          when(col("dur_sec") === 0, "a_single_event")
            .when(col("dur_sec") < 60, "b_under_1m")
            .when(col("dur_sec") < 600, "c_1m_to_10m")
            .when(col("dur_sec") < 1800, "d_10m_to_30m")
            .otherwise("e_over_30m"))
        .groupBy(col("dur_bucket"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_ev")).as("n_events"),
          round(sum(col("n_ev")).cast("double") /
            count(lit(1)).cast("double"), 6).as("avg_events"))
        .orderBy(col("dur_bucket"))
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, event_id, te,
               CASE WHEN te - LAG(te) OVER w > 1800
                    OR LAG(te) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM (SELECT user_id, event_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS te FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY te, event_id)),
      sessions AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id
                 ORDER BY te, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id,
               te
        FROM flagged),
      per_session AS (
        SELECT user_id, session_id,
               MAX(te) - MIN(te) AS dur_sec,
               COUNT(*) AS n_ev
        FROM sessions GROUP BY user_id, session_id)
      SELECT CASE WHEN dur_sec = 0 THEN 'a_single_event'
                  WHEN dur_sec < 60 THEN 'b_under_1m'
                  WHEN dur_sec < 600 THEN 'c_1m_to_10m'
                  WHEN dur_sec < 1800 THEN 'd_10m_to_30m'
                  ELSE 'e_over_30m' END AS dur_bucket,
             COUNT(*) AS n_sessions,
             CAST(SUM(n_ev) AS BIGINT) AS n_events,
             round(CAST(SUM(n_ev) AS DOUBLE) / COUNT(*), 6) AS avg_events
      FROM per_session
      GROUP BY 1
      ORDER BY dur_bucket"""))

  val q57_daily_change = Q(
    "q57_daily_change",
    (s, dir) => {
      // Day-over-day volume change per event type — the ops dashboard
      // query behind traffic-anomaly alerts. Daily counts aggregate
      // map-side to a (|days| × |types|)-row relation, so the LAG
      // window runs on a dimension-sized input partitioned by type;
      // the change ratio is one rounded division of exact longs.
      // First day per type has no baseline and is excluded (a NULL
      // would hash differently across engines' float formatting).
      val daily = Tables(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily
        .withColumn("prev_n", lag(col("n_events"), 1).over(w))
        .filter(col("prev_n").isNotNull)
        .select(col("day"), col("event_type"), col("n_events"),
          round((col("n_events") - col("prev_n")).cast("double") /
            col("prev_n").cast("double"), 6).as("pct_change"))
        .orderBy(col("day"), col("event_type"))
    },
    Some("""
      WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2)
      SELECT day, event_type, n_events,
             round(CAST(n_events - prev_n AS DOUBLE) /
                   CAST(prev_n AS DOUBLE), 6) AS pct_change
      FROM (
        SELECT day, event_type, n_events,
               LAG(n_events) OVER (PARTITION BY event_type
                 ORDER BY day) AS prev_n
        FROM daily)
      WHERE prev_n IS NOT NULL
      ORDER BY day, event_type"""))

  val q61_hourly_anomaly = Q(
    "q61_hourly_anomaly",
    (s, dir) => {
      // Hour-of-day volume anomaly per event type — the alerting query
      // behind q57's dashboard: each type's 24-slot diurnal profile is
      // z-scored against its own mean/sd, so a traffic spike (or a dead
      // hour) surfaces as |z| > 2 regardless of the type's base rate.
      // Counts aggregate map-side to a dense (|types| x 24) grid (the
      // missing-hour zeros matter: a silent hour IS the anomaly), the
      // per-type moments are a 24-row aggregate, and both grid and
      // stats come back as broadcasts — after the one count shuffle,
      // everything downstream is dimension-sized at any corpus scale.
      val counts = Tables(s, dir, "events")
        .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
        .agg(count(lit(1)).as("n_events"))
      val hours = s.range(0, 24).select(col("id").as("hod"))
      val dense = counts.select(col("event_type")).distinct()
        .crossJoin(broadcast(hours)) // |types| x 24
        .join(counts, Seq("event_type", "hod"), "left")
        .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      val stats = dense.groupBy(col("event_type"))
        .agg(sum(col("n_events")).as("s"),
          sum(col("n_events") * col("n_events")).as("sq"))
        .withColumn("mean", col("s").cast("double") / lit(24))
        .withColumn("sd", sqrt(greatest(
          col("sq").cast("double") / lit(24) - col("mean") * col("mean"),
          lit(0.0))))
        .select(col("event_type"), col("mean"), col("sd"))
      dense.join(broadcast(stats), "event_type")
        .withColumn("z", when(col("sd") > 0,
          round((col("n_events").cast("double") - col("mean")) / col("sd"), 6))
          .otherwise(0.0))
        .select(col("event_type"), col("hod"), col("n_events"),
          round(col("mean"), 6).as("mean_events"), col("z"),
          (abs(col("z")) > 2.0).as("is_anomaly"))
        .orderBy(col("event_type"), col("hod"))
    },
    Some("""
      WITH counts AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2),
      grid AS (
        SELECT t.event_type, CAST(g.r AS BIGINT) AS hod
        FROM (SELECT DISTINCT event_type FROM events) t,
             unnest(range(0, 24)) AS g(r)),
      dense AS (
        SELECT g.event_type, g.hod,
               CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events
        FROM grid g LEFT JOIN counts c USING (event_type, hod)),
      stats AS (
        SELECT event_type,
               CAST(SUM(n_events) AS DOUBLE) / 24 AS mean,
               sqrt(greatest(
                 CAST(SUM(n_events * n_events) AS DOUBLE) / 24 -
                   (CAST(SUM(n_events) AS DOUBLE) / 24) *
                   (CAST(SUM(n_events) AS DOUBLE) / 24), 0.0)) AS sd
        FROM dense GROUP BY 1),
      scored AS (
        SELECT d.event_type, d.hod, d.n_events,
               round(s.mean, 6) AS mean_events,
               CASE WHEN s.sd > 0 THEN
                 round((CAST(d.n_events AS DOUBLE) - s.mean) / s.sd, 6)
               ELSE 0.0 END AS z
        FROM dense d JOIN stats s USING (event_type))
      SELECT event_type, hod, n_events, mean_events, z,
             abs(z) > 2.0 AS is_anomaly
      FROM scored ORDER BY event_type, hod"""))

  val all: Seq[Q] = Seq(q29_funnel, q30_retention, q31_histogram,
    q32_exact_median, q54_event_transitions, q55_top_transitions,
    q56_session_stats, q57_daily_change, q61_hourly_anomaly)
}
