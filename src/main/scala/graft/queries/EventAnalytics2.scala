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

  val all: Seq[Q] = Seq(q29_funnel, q30_retention, q31_histogram,
    q32_exact_median)
}
