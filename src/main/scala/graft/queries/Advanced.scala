package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Exact, Tables}

/** Additional relational breadth: outer joins, set operations, the full
  * window-function family, string functions, and (rows-only) sketch
  * approximations. */
object Advanced {
  import Exact.dec

  val q22_outer_join = Q(
    "q22_outer_join",
    (s, dir) => {
      // TPC-H Q13 pattern: customer order-count distribution including
      // zero-order customers — the left outer join keeps them, the
      // count(o_orderkey) counts only matches.
      val cust = Tables(s, dir, "customer").select("c_custkey")
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      SELECT c_count, COUNT(*) AS custdist
      FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""))

  val q23_set_ops = Q(
    "q23_set_ops",
    (s, dir) => {
      // INTERSECT / EXCEPT over key sets: customers with orders in both
      // halves of the date range vs only the first half.
      val ord = Tables(s, dir, "orders")
      val early = ord.filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      val late = ord.filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      val both = early.intersect(late).agg(count(lit(1)).as("n")).select(
        lit("both_halves").as("cohort"), col("n"))
      val onlyEarly = early.except(late).agg(count(lit(1)).as("n")).select(
        lit("early_only").as("cohort"), col("n"))
      both.union(onlyEarly).orderBy(col("cohort"))
    },
    Some("""
      SELECT 'both_halves' AS cohort, COUNT(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
      UNION ALL
      SELECT 'early_only' AS cohort, COUNT(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
      ORDER BY cohort"""))

  val q24_window_suite = Q(
    "q24_window_suite",
    (s, dir) => {
      // The window family in one pass over a single shuffle: ranking,
      // offsets, running and moving frames. All inputs exact => every
      // engine agrees bit-for-bit.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val price = dec(col("o_totalprice"))
      Tables(s, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          rank().over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .cast("int").as("price_rank"),
          dense_rank().over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderpriority"))).cast("int").as("prio_rank"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          sum(price).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("running_total"),
          (sum(price).over(w.rowsBetween(-2, 0)).cast("double") /
            count(lit(1)).over(w.rowsBetween(-2, 0)))
            .as("moving_avg3"),
          ntile(4).over(w).cast("int").as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             CAST(RANK() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank,
             CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
               ORDER BY o_orderpriority) AS INT) AS prio_rank,
             LAG(o_orderkey, 1) OVER w AS prev_order,
             LEAD(o_orderkey, 1) OVER w AS next_order,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
               OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
               OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3,
             CAST(NTILE(4) OVER w AS INT) AS quartile
      FROM orders
      WHERE o_custkey < 50
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""))

  val t05_string_suite = Q(
    "t05_string_suite",
    (s, dir) => {
      // String function family over customer names (deterministic,
      // locale-free operations only).
      Tables(s, dir, "customer")
        .filter(col("c_custkey") < 100)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          length(col("c_name")).cast("long").as("name_len"),
          substring(col("c_name"), 1, 8).as("prefix"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
          levenshtein(col("c_name"), col("c_mktsegment")).cast("long")
            .as("lev_dist"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey,
             upper(c_name) AS uname,
             CAST(length(c_name) AS BIGINT) AS name_len,
             substr(c_name, 1, 8) AS prefix,
             lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
             regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
             concat_ws('|', c_mktsegment, c_name) AS tagged,
             CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS lev_dist
      FROM customer
      WHERE c_custkey < 100
      ORDER BY c_custkey"""))

  /** Sketch-based approximations (HLL++, KLL-style quantiles): the 100 TB
    * path for cardinality/percentiles. Estimates are engine-specific by
    * construction, so this variant is NOT oracle-gated; its error bands
    * are asserted against the exact twin [[q25_distinct_median]] in
    * `SketchAccuracySpec` ("hll/percentile sketches track exact twin"). */
  def approxSketches(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val q25_distinct_median = Q(
    "q25_distinct_median",
    (s, dir) => {
      // Exact twin of the sketch pack: per-group exact distinct count and
      // exact interpolated median. Both engines compute the median over
      // doubles (2-dp money values are exact in binary at this magnitude;
      // the interpolated midpoint is rounded to 4dp to pin the last bit).
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count_distinct(col("l_partkey")).as("n_parts"),
          round(percentile(col("l_extendedprice").cast("double"), lit(0.5)), 4)
            .as("median_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_partkey) AS n_parts,
             round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS median_price,
             COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  val q26_asof_join = Q(
    "q26_asof_join",
    (s, dir) => {
      // Point-in-time correctness: each purchase joined to the user's most
      // recent signup at-or-before it. Spark lacks ASOF JOIN; the
      // union+carry composition (graft.operators.AsOf) does it in one
      // shuffle. Time key is epoch MICROS (strict order) so ties cannot
      // depend on input order; oracle is DuckDB's native ASOF LEFT JOIN.
      val ev = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("te"))
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("te").as("p_te"))
      val signups = ev.filter(col("event_type") === "signup").select(
        col("user_id"), col("event_id").as("signup_id"),
        col("te").as("s_te"))
      graft.operators.AsOf
        .join(purchases, signups, Seq("user_id"), "p_te", "s_te")
        .orderBy(col("purchase_id"))
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS te
                 FROM events),
      p AS (SELECT user_id, event_id AS purchase_id, te AS p_te
            FROM e WHERE event_type = 'purchase'),
      s AS (SELECT user_id, event_id AS signup_id, te AS s_te
            FROM e WHERE event_type = 'signup')
      SELECT p.user_id, p.purchase_id, p.p_te,
             s.signup_id AS asof_signup_id, s.s_te AS asof_s_te
      FROM p ASOF LEFT JOIN s
        ON p.user_id = s.user_id AND p.p_te >= s.s_te
      ORDER BY purchase_id"""))

  val q58_asof_tolerance = Q(
    "q58_asof_tolerance",
    (s, dir) => {
      // Tolerance-bounded as-of join (pandas merge_asof(tolerance=...)):
      // each purchase takes the user's most recent signup AT OR BEFORE
      // it, but only if it happened within the last 24h — older matches
      // are nulled, distinguishing "recently signed up" from "signed up
      // long ago" in attribution. Same one-shuffle union+carry plan as
      // q26; the tolerance is a post-carry projection, so the bound adds
      // ZERO extra shuffles (the naive formulation is a time-range
      // inequality join — a per-key cross product).
      val tolMicros = 86400L * 1000000L
      val ev = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("te"))
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("te").as("p_te"))
      val signups = ev.filter(col("event_type") === "signup").select(
        col("user_id"), col("event_id").as("signup_id"),
        col("te").as("s_te"))
      val joined = graft.operators.AsOf
        .join(purchases, signups, Seq("user_id"), "p_te", "s_te")
      val fresh = col("asof_s_te").isNotNull &&
        col("p_te") - col("asof_s_te") <= tolMicros
      joined
        .select(col("user_id"), col("purchase_id"), col("p_te"),
          when(fresh, col("asof_signup_id")).as("signup_id_24h"),
          when(fresh, col("asof_s_te")).as("s_te_24h"))
        .orderBy(col("purchase_id"))
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS te
                 FROM events),
      p AS (SELECT user_id, event_id AS purchase_id, te AS p_te
            FROM e WHERE event_type = 'purchase'),
      s AS (SELECT user_id, event_id AS signup_id, te AS s_te
            FROM e WHERE event_type = 'signup')
      SELECT p.user_id, p.purchase_id, p.p_te,
             CASE WHEN s.s_te IS NOT NULL
                   AND p.p_te - s.s_te <= 86400000000
                  THEN s.signup_id END AS signup_id_24h,
             CASE WHEN s.s_te IS NOT NULL
                   AND p.p_te - s.s_te <= 86400000000
                  THEN s.s_te END AS s_te_24h
      FROM p ASOF LEFT JOIN s
        ON p.user_id = s.user_id AND p.p_te >= s.s_te
      ORDER BY purchase_id"""))

  val q59_asof_skewsafe = Q(
    "q59_asof_skewsafe",
    (s, dir) => {
      // The SAME point-in-time semantics as q26, through the skew-safe
      // operator (graft.operators.AsOf.joinSkewSafe): every key's carry
      // chain is sharded over deterministic time buckets and stitched
      // with a boundary prefix, so one hot user_id holding half the
      // stream runs as `buckets` parallel tasks instead of one. Sharing
      // q26's DuckDB ASOF oracle makes the equivalence ORACLE-GATED,
      // not just spec-asserted: both formulations must hash-match the
      // same native as-of answer at every SF.
      val ev = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("te"))
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("te").as("p_te"))
      val signups = ev.filter(col("event_type") === "signup").select(
        col("user_id"), col("event_id").as("signup_id"),
        col("te").as("s_te"))
      graft.operators.AsOf
        .joinSkewSafe(purchases, signups, Seq("user_id"), "p_te", "s_te",
          buckets = 16)
        .orderBy(col("purchase_id"))
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS te
                 FROM events),
      p AS (SELECT user_id, event_id AS purchase_id, te AS p_te
            FROM e WHERE event_type = 'purchase'),
      s AS (SELECT user_id, event_id AS signup_id, te AS s_te
            FROM e WHERE event_type = 'signup')
      SELECT p.user_id, p.purchase_id, p.p_te,
             s.signup_id AS asof_signup_id, s.s_te AS asof_s_te
      FROM p ASOF LEFT JOIN s
        ON p.user_id = s.user_id AND p.p_te >= s.s_te
      ORDER BY purchase_id"""))

  val q27_range_join = Q(
    "q27_range_join",
    (s, dir) => {
      // Band join via bucketing (graft.operators.RangeJoin): for every
      // error event, count the same user's clicks within +/-1 hour. The
      // naive |t1-t2|<=tol join is a nested-loop cross product; bucketing
      // makes it an equi-join with 3x fan-out.
      val ev = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("te"))
      val errors = ev.filter(col("event_type") === "error").select(
        col("user_id"), col("event_id").as("error_id"), col("te").as("e_te"))
      val clicks = ev.filter(col("event_type") === "click").select(
        col("user_id"), col("event_id").as("click_id"), col("te").as("c_te"))
      graft.operators.RangeJoin
        .bucketed(errors, clicks, Seq("user_id"), "e_te", "c_te", 3600L)
        .groupBy(col("error_id"))
        .agg(count(lit(1)).as("n_nearby_clicks"))
        .orderBy(col("error_id"))
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type,
                        CAST(floor(epoch(ts)) AS BIGINT) AS te FROM events)
      SELECT err.event_id AS error_id, COUNT(*) AS n_nearby_clicks
      FROM (SELECT * FROM e WHERE event_type = 'error') err
      JOIN (SELECT * FROM e WHERE event_type = 'click') clk
        ON err.user_id = clk.user_id
       AND abs(err.te - clk.te) <= 3600
      GROUP BY err.event_id
      ORDER BY error_id"""))

  val q28_argmin_group = Q(
    "q28_argmin_group",
    (s, dir) => {
      // TPC-H Q2 pattern: the row(s) achieving a per-group extreme —
      // aggregate to (group, min), then join back on the pair. Two
      // shuffles on the same key; no window materialization of the whole
      // table when only extreme rows survive.
      val sup = Tables(s, dir, "supplier")
      val mins = sup.groupBy(col("s_nationkey").as("nk"))
        .agg(min(col("s_acctbal")).as("min_bal"))
      val nation = Tables(s, dir, "nation").select("n_nationkey", "n_name")
      sup.join(broadcast(mins),
          col("s_nationkey") === col("nk") && col("s_acctbal") === col("min_bal"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"))
        .orderBy(col("n_name"), col("s_suppkey"))
    },
    Some("""
      SELECT n_name, s_suppkey, s_name, s_acctbal
      FROM supplier
      JOIN (SELECT s_nationkey AS nk, MIN(s_acctbal) AS min_bal
            FROM supplier GROUP BY s_nationkey) m
        ON s_nationkey = nk AND s_acctbal = min_bal
      JOIN nation ON s_nationkey = n_nationkey
      ORDER BY n_name, s_suppkey"""))

  val q33_null_logic = Q(
    "q33_null_logic",
    (s, dir) => {
      // Null-handling family over an outer join's null-extended side:
      // coalesce / nullif / greatest / least / null-counting semantics.
      val cust = Tables(s, dir, "customer").select(
        col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      val recent = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .groupBy(col("o_custkey"))
        .agg(Exact.money(sum(dec(col("o_totalprice")))).as("recent_total"))
      cust.join(recent, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          count(col("recent_total")).as("n_active"),
          sum(when(col("recent_total").isNull, 1L).otherwise(0L))
            .as("n_inactive"),
          Exact.money(sum(dec(coalesce(col("recent_total"), lit(0.0)))))
            .as("total_coalesced"),
          max(greatest(col("c_acctbal"), coalesce(col("recent_total"), lit(0.0))))
            .as("max_either"),
          min(least(col("c_acctbal"), coalesce(col("recent_total"), lit(0.0))))
            .as("min_either"),
          sum(when(nullif(col("c_mktsegment"), lit("BUILDING")).isNull, 1L)
            .otherwise(0L)).as("n_building"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment,
             COUNT(*) AS n,
             COUNT(recent_total) AS n_active,
             CAST(SUM(CASE WHEN recent_total IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive,
             CAST(CAST(SUM(CAST(COALESCE(recent_total, 0.0) AS DECIMAL(18,6))) AS DECIMAL(30,4)) AS DOUBLE) AS total_coalesced,
             MAX(GREATEST(c_acctbal, COALESCE(recent_total, 0.0))) AS max_either,
             MIN(LEAST(c_acctbal, COALESCE(recent_total, 0.0))) AS min_either,
             CAST(SUM(CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_building
      FROM customer
      LEFT OUTER JOIN (
        SELECT o_custkey,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(30,4)) AS DOUBLE) AS recent_total
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        GROUP BY o_custkey) r
        ON c_custkey = o_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  val q34_datetime = Q(
    "q34_datetime",
    (s, dir) => {
      // Date/time family on portable arithmetic: day-of-week via epoch
      // days (engine dayofweek() origins differ), month/quarter/year
      // extraction, day difference, date shifting.
      val ord = Tables(s, dir, "orders").filter(col("o_orderkey") < 200)
      ord.select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        // 0=Monday, portable: 1970-01-01 was a Thursday
        pmod(floor(unix_timestamp(col("o_orderdate")) / 86400L) + 3, lit(7))
          .cast("long").as("dow_monday0"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate"))
          .cast("long").as("days_to_2002"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd")
          .as("plus30"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
          .as("month_end"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS d,
             CAST(year(o_orderdate) AS BIGINT) AS y,
             CAST(quarter(o_orderdate) AS BIGINT) AS q,
             CAST(month(o_orderdate) AS BIGINT) AS m,
             CAST(day(o_orderdate) AS BIGINT) AS dom,
             CAST((CAST(floor(floor(epoch(o_orderdate)) / 86400) AS BIGINT) + 3) % 7 AS BIGINT) AS dow_monday0,
             CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
             strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
      FROM orders
      WHERE o_orderkey < 200
      ORDER BY o_orderkey"""))

  val q36_native_topk = Q(
    "q36_native_topk",
    (s, dir) => {
      // The custom TopKPerKey operator (logical node + strategy + exec
      // with map-side partial top-k) on the q07 semantics: top-3 orders
      // per customer. Shuffles at most 3 rows per (customer, input
      // partition) instead of every order — the oracle is the standard
      // window formulation.
      org.apache.spark.sql.graft.TopKPerKey(
        Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        keys = Seq(col("o_custkey")),
        order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3)
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders)
      WHERE rk <= 3
      ORDER BY o_custkey, o_totalprice DESC, o_orderkey"""))

  val q37_disjunctive_join = Q(
    "q37_disjunctive_join",
    (s, dir) => {
      // TPC-H Q19 pattern: OR-of-ANDs predicate spanning both join sides.
      // The join key still drives an equi-join; only the residual
      // disjunction is evaluated post-probe (never a nested loop).
      val part = Tables(s, dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_retailprice")
      val li = Tables(s, dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "BRAND#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "BRAND#2" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 30)) ||
            (col("p_retailprice") > 1800.0 && col("l_quantity") >= 40))
        .agg(
          Exact.money(sum(Relational.revenue(col("l_extendedprice"), col("l_discount"))))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some(s"""
      SELECT CAST(CAST(SUM(${Relational.revenueSql}) AS DECIMAL(30,4)) AS DOUBLE) AS revenue,
             COUNT(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'BRAND#1' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'BRAND#2' AND p_size BETWEEN 10 AND 30
             AND l_quantity BETWEEN 10 AND 30)
         OR (p_retailprice > 1800.0 AND l_quantity >= 40)"""))

  val q38_returned_revenue = Q(
    "q38_returned_revenue",
    (s, dir) => {
      // TPC-H Q10 pattern: per-customer revenue lost to returned items,
      // top 20. Fact join shuffles on the order key; customer+nation
      // dimensions broadcast onto the aggregated (small) result.
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ord = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
      val nation = Tables(s, dir, "nation").select("n_nationkey", "n_name")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        // per-customer grain: long cents sums are exact at any SF
        .agg(Exact.moneyE4(sum(Exact.revenueE4(
          col("l_extendedprice"), col("l_discount")))).as("lost_revenue"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("lost_revenue"))
        .orderBy(col("lost_revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""
      SELECT c_custkey, c_name, n_name,
             CAST(SUM(${Relational.revenueE4Sql}) AS DOUBLE) / 10000.0 AS lost_revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY lost_revenue DESC, c_custkey
      LIMIT 20"""))

  val q39_large_volume_orders = Q(
    "q39_large_volume_orders",
    (s, dir) => {
      // TPC-H Q18 pattern: orders whose total quantity exceeds a
      // threshold — grouped HAVING produces the key set, a semi join
      // filters the fact table against it.
      val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val big = li.groupBy(col("l_orderkey"))
        // quantities are integer-valued: LONG sums are exact, no decimal
        .agg(sum(col("l_quantity").cast("long")).cast("double").as("total_qty"))
        .filter(col("total_qty") > 150.0)
      Tables(s, dir, "orders")
        .join(big, col("o_orderkey") === big("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(50)
    },
    Some("""
      SELECT o_orderkey, o_custkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             o_totalprice, total_qty
      FROM orders
      JOIN (SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) > 150.0) b
        ON o_orderkey = b.l_orderkey
      ORDER BY total_qty DESC, o_orderkey
      LIMIT 50"""))

  val all: Seq[Q] = Seq(q22_outer_join, q23_set_ops, q24_window_suite,
    t05_string_suite, q25_distinct_median, q26_asof_join, q27_range_join,
    q28_argmin_group, q33_null_logic, q34_datetime, q36_native_topk,
    q37_disjunctive_join, q38_returned_revenue, q39_large_volume_orders,
    q58_asof_tolerance, q59_asof_skewsafe)
}
