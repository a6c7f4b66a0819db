package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables}

/** Statistical aggregates with engine-independent arithmetic.
  *
  * Variance/stddev are computed from exact decimal power sums (sum x,
  * sum x^2) followed by identical scalar double math on both engines —
  * Spark's built-in `stddev` streams Welford-style updates whose result
  * depends on partition order, which can't hash-match a serial oracle.
  */
object Stats {
  import Exact.dec

  val q19_count_distinct = Q(
    "q19_count_distinct",
    (s, dir) => {
      // Exact distinct counts (expand + two-phase agg) alongside a global
      // approx_count_distinct used at 100 TB scale for cheap cardinality.
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  val q20_stats_moments = Q(
    "q20_stats_moments",
    (s, dir) => {
      val x = dec(col("c_acctbal"))
      Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"),
          Exact.money(sum(x * x)).as("sx2"))
        .select(
          col("c_mktsegment"),
          col("n"),
          (col("sx") / col("n")).as("mean_acctbal"),
          sqrt(
            (col("sx2") - col("sx") * col("sx") / col("n")) /
              (col("n") - lit(1)))
            .as("std_acctbal"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment, n,
             sx / n AS mean_acctbal,
             sqrt((sx2 - sx * sx / n) / (n - 1)) AS std_acctbal
      FROM (
        SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(30,4)) AS DOUBLE) AS sx2
        FROM customer
        GROUP BY c_mktsegment)
      ORDER BY c_mktsegment"""))

  val q21_min_max_top = Q(
    "q21_min_max_top",
    (s, dir) => {
      // Min/max/first-by-order: order statistics that are exact regardless
      // of parallelism (no floating accumulation).
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_orderdate")).cast("date").cast("string").as("first_date"),
          max(col("o_orderdate")).cast("date").cast("string").as("last_date"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority,
             MIN(o_totalprice) AS min_price,
             MAX(o_totalprice) AS max_price,
             strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_date,
             strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_date
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  val q41_cube = Q(
    "q41_cube",
    (s, dir) => {
      // Full CUBE (all grouping-set combinations), complementing q16's
      // ROLLUP: one Expand + aggregate, no per-combination rescans.
      Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(Exact.dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("sum_qty"))
        .orderBy(col("rflag"), col("lstatus"))
    },
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
             COALESCE(l_linestatus, 'ALL') AS lstatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY rflag, lstatus"""))

  val q49_grouping_sets = Q(
    "q49_grouping_sets",
    (s, dir) => {
      // Explicit GROUPING SETS — the asymmetric cousin of q16 ROLLUP and
      // q41 CUBE: exactly the requested combinations ((rf, ls), (ls), ())
      // in ONE Expand + aggregate; grouping_id() disambiguates which set
      // produced a row (COALESCE alone cannot when a set omits a column).
      Tables(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          sum(Exact.dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("gid"), col("n"), col("sum_qty"))
        .orderBy(col("gid"), col("rflag"), col("lstatus"))
    },
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
             COALESCE(l_linestatus, 'ALL') AS lstatus,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      ORDER BY gid, rflag, lstatus"""))

  val q42_relational_division = Q(
    "q42_relational_division",
    (s, dir) => {
      // Relational division ("for all"): customers who placed orders in
      // EVERY quarter of 1999 — the universal quantifier expressed as
      // count-distinct-equals-cardinality, one aggregate pass instead of
      // four self-joins.
      //
      // The year predicate is a half-open range, not year(...)=1999:
      // year() over a column is not a pushable parquet predicate, while
      // the range reaches the scan as PushedFilters and prunes row
      // groups on o_orderdate min/max — at 100 TB that is a pruned scan
      // vs a full one (plan-shape pinned in QueriesSmokeSpec).
      Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
        .groupBy(col("o_custkey"))
        .agg(
          countDistinct(quarter(col("o_orderdate"))).as("n_quarters"),
          count(lit(1)).as("n_orders"))
        .filter(col("n_quarters") === 4)
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey,
             COUNT(DISTINCT quarter(o_orderdate)) AS n_quarters,
             COUNT(*) AS n_orders
      FROM orders
      WHERE year(o_orderdate) = 1999
      GROUP BY o_custkey
      HAVING COUNT(DISTINCT quarter(o_orderdate)) = 4
      ORDER BY o_custkey"""))

  val q50_custdist = Q(
    "q50_custdist",
    (s, dir) => {
      // TPC-H Q13 shape: the distribution of per-customer order counts
      // INCLUDING zero-order customers — a left outer join with the
      // predicate on the ORDER side of the join (moving it to a WHERE
      // after the join would silently delete the zero bucket), then a
      // second aggregate over the first. Scale shape: the orders filter
      // runs before the shuffle, the join shuffles on the customer key
      // (AQE broadcasts the customer side while it is small), the
      // per-customer count rides the join partitioning, and the final
      // distribution is a |distinct c_count|-row aggregate.
      val c = Tables(s, dir, "customer").select(col("c_custkey"))
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""))

  val all: Seq[Q] = Seq(q19_count_distinct, q20_stats_moments, q21_min_max_top,
    q41_cube, q42_relational_division, q49_grouping_sets, q50_custdist)
}
