package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** Correlated-subquery pack: the TPC-H shapes (Q2/Q11/Q17/Q20/Q21/Q22)
  * that exercise Catalyst's subquery machinery — scalar-subquery rewrite,
  * `DecorrelateInnerQuery`, and LeftSemi/LeftAnti joins derived from
  * EXISTS / NOT EXISTS / IN with aggregates in the inner query.
  *
  * These are deliberately written as SQL text, not DataFrame calls: the
  * operator being shipped IS the decorrelation. Catalyst rewrites each
  * correlated scalar subquery into an aggregate + equi-join on the
  * correlation key (so at 100 TB the inner aggregate is one shuffled
  * pass over the fact table, never a per-outer-row re-execution), and
  * EXISTS/NOT EXISTS become semi/anti hash joins. The same text runs on
  * the DuckDB oracle — every query here is dialect-neutral on purpose.
  *
  * q44 and q47 are phrased as single-fact-pass window queries instead of
  * their textbook subquery forms: Spark inlines CTEs (no materialization),
  * so a threshold subquery over a CTE re-executes the whole pipeline —
  * see each query's scaladoc for the scan-count argument. The subquery
  * operators those forms would have demonstrated remain covered by
  * q43/q45/q46 (correlated scalar) and q04/q10/q46/q48 (semi/anti).
  *
  * Determinism: money sums use either the DECIMAL(18,6)→DECIMAL(30,4)→
  * DOUBLE ladder or the integer-cents path (q44 — see
  * [[graft.core.Exact]]), both exact and order-independent; `l_quantity`
  * is integer-valued so its double sums/avgs are exact in any order;
  * every query ends in a total ORDER BY.
  */
object Subqueries {
  private def onViews(tables: String*)(sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => {
      tables.foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
      s.sql(sql)
    }

  private def dual(name: String, tables: Seq[String], sql: String): Q =
    Q(name, onViews(tables: _*)(sql), Some(sql))

  private val revenueSql = Relational.revenueSql

  /** TPC-H Q2 shape: correlated scalar MIN — for each small part, the
    * supplier(s) selling it at the part's minimum price. Decorrelates to
    * a per-part min aggregate joined back on the part key. */
  val q43_min_cost_supplier: Q = dual(
    "q43_min_cost_supplier",
    Seq("part", "supplier", "lineitem"),
    """
      SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name,
                      l_extendedprice AS min_price
      FROM part
      JOIN lineitem ON l_partkey = p_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE p_size <= 5
        AND l_extendedprice = (
          SELECT MIN(l2.l_extendedprice)
          FROM lineitem l2
          WHERE l2.l_partkey = p_partkey)
      ORDER BY p_partkey, s_suppkey""")

  /** TPC-H Q11 shape: grouped value vs a global threshold — parts whose
    * revenue exceeds 1.5x the average per-part revenue.
    *
    * Two scale properties by construction: (1) the fact table is scanned
    * ONCE — the global total is exactly the sum of the per-part revenues
    * already grouped in `rev`, computed as an empty-frame window over the
    * grouped result (20k rows at sf0.1, k rows at any scale — the window
    * input is the GROUPED table, never the fact table). A scalar-subquery
    * phrasing re-executes the whole CTE on Spark, which inlines CTEs
    * rather than materializing them (the uncorrelated-scalar operator
    * itself is exercised by q14/q48); (2) the threshold is relative to the
    * per-part AVERAGE, so the query returns a non-empty, similarly-sized
    * result at every scale factor (a fixed share-of-total threshold
    * shrinks to zero rows as part count grows).
    *
    * Arithmetic is the integer-cents fast path (see [[graft.core.Exact]]):
    * money is exact 2-decimal data, so `round(x*100)` longs carry the
    * identical value at ~25x less per-row cost than Decimal multiplies —
    * this matters because the single-split testdata layout serializes the
    * map-side partial aggregate. Per-part sums fit a LONG at any scale;
    * the global total accumulates as DECIMAL(38,0) (overflow-proof), and
    * every double cast is of an exact integer, so both engines round
    * identically. */
  val q44_value_share: Q = dual(
    "q44_value_share",
    Seq("lineitem"),
    """
      WITH rev AS (
        SELECT l_partkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
                   (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_e4
        FROM lineitem
        GROUP BY l_partkey)
      SELECT l_partkey, revenue
      FROM (
        SELECT l_partkey, CAST(rev_e4 AS DOUBLE) / 10000.0 AS revenue,
               CAST(1.5 AS DOUBLE) *
                 (CAST(SUM(CAST(rev_e4 AS DECIMAL(38,0))) OVER ()
                       AS DOUBLE) / 10000.0)
                 / COUNT(*) OVER () AS thr
        FROM rev) s
      WHERE revenue > thr
      ORDER BY revenue DESC, l_partkey""")

  /** TPC-H Q17 shape: correlated AVG — small-quantity lineitems per
    * brand, "small" defined relative to the part's own average quantity.
    * Decorrelates to a per-part avg joined on l_partkey (quantities are
    * integer-valued doubles, so the avg is order-independent). */
  val q45_small_qty_brand: Q = dual(
    "q45_small_qty_brand",
    Seq("part", "lineitem"),
    """
      SELECT p_brand,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(30,4)) AS DOUBLE) AS total_price,
             COUNT(*) AS n_small
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        AND l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p_partkey)
      GROUP BY p_brand
      ORDER BY p_brand""")

  /** TPC-H Q20 shape: IN over a grouped subquery whose HAVING compares
    * against a correlated scalar — suppliers holding > 15% of any large
    * part's total shipped quantity. Two nested subqueries: an
    * uncorrelated IN (semi join) and a correlated aggregate-vs-aggregate
    * threshold. */
  val q46_part_share_suppliers: Q = dual(
    "q46_part_share_suppliers",
    Seq("part", "supplier", "lineitem"),
    """
      SELECT s_suppkey, s_name
      FROM supplier
      WHERE s_suppkey IN (
        SELECT li.l_suppkey
        FROM lineitem li
        WHERE li.l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
        GROUP BY li.l_suppkey, li.l_partkey
        HAVING SUM(li.l_quantity) > 0.15 * (
          SELECT SUM(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = li.l_partkey))
      ORDER BY s_suppkey""")

  /** TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    * finished multi-supplier order (late = shipped > 90 days after the
    * order date).
    *
    * The textbook phrasing is fact + EXISTS + NOT EXISTS; that
    * decorrelates soundly (LeftSemi + LeftAnti on l_orderkey) but scans
    * the fact table three times. Since both subqueries range over the SAME
    * order's lineitems, their predicates are per-order-group facts:
    * "another supplier exists" and "no other late supplier" are MIN/MAX
    * comparisons over a window partitioned by l_orderkey — one fact scan,
    * one shuffle on the order key, identical semantics (the semi/anti
    * decorrelation operator itself is exercised by q04/q10/q46/q48).
    * MIN<>MAX detects a second distinct supplier without COUNT(DISTINCT),
    * which window frames don't support on either engine; `single_late`
    * compares the CASE-filtered MIN/MAX, non-null because the outer filter
    * keeps only late rows. At 100 TB this is the plan you want: the window
    * state is bounded per order (7 lineitems max per TPC-H order), so it
    * streams within each hash partition. */
  val q47_waiting_suppliers: Q = dual(
    "q47_waiting_suppliers",
    Seq("supplier", "lineitem", "orders"),
    """
      SELECT s_name, COUNT(*) AS numwait
      FROM (
        SELECT l_suppkey, late,
               MIN(l_suppkey) OVER w <> MAX(l_suppkey) OVER w AS multi_supp,
               MIN(CASE WHEN late = 1 THEN l_suppkey END) OVER w
                 = MAX(CASE WHEN late = 1 THEN l_suppkey END) OVER w AS single_late
        FROM (
          SELECT l_orderkey, l_suppkey,
                 CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END AS late
          FROM lineitem
          JOIN orders ON o_orderkey = l_orderkey
          WHERE o_orderstatus = 'F') lf
        WINDOW w AS (PARTITION BY l_orderkey)) x
      JOIN supplier ON s_suppkey = x.l_suppkey
      WHERE late = 1 AND multi_supp AND single_late
      GROUP BY s_name
      ORDER BY numwait DESC, s_name""")

  /** TPC-H Q22 shape: scalar avg threshold + NOT EXISTS anti join —
    * above-average-balance customers with no recent orders, grouped by a
    * country-code analog (nation key bucket). */
  val q48_idle_rich_custs: Q = dual(
    "q48_idle_rich_custs",
    Seq("customer", "orders"),
    """
      SELECT cntry, COUNT(*) AS numcust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
      FROM (
        SELECT CAST(c_nationkey % 5 AS INT) AS cntry, c_acctbal, c_custkey
        FROM customer
        WHERE c_nationkey % 5 IN (0, 1, 2, 3)
          AND c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
            FROM customer c2
            WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-07-01'))
      GROUP BY cntry
      ORDER BY cntry""")

  /** TPC-H Q7 shape (volume shipping): nation-to-nation revenue flows —
    * the widest join in the pack: lineitem⋈orders⋈customer⋈supplier and
    * TWO nation dimension joins, a disjunctive cross-nation predicate,
    * and a grouped exact-decimal revenue rollup by year. Catalyst
    * broadcast-joins every dimension side (supplier/customer/nation are
    * size-bounded relative to the facts) and shuffles only the
    * fact-fact join on orderkey; the ship-date range reaches the
    * lineitem scan as a pushed filter. */
  val q51_nation_trade: Q = dual(
    "q51_nation_trade",
    Seq("lineitem", "orders", "customer", "supplier", "nation"),
    s"""
      SELECT supp_nation, cust_nation, l_year,
             CAST(SUM(volume) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               $revenueSql AS volume
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01')
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year""")

  /** TPC-H Q8 shape (national market share): one nation's share of a
    * region's revenue in one part type, per year. The conditional-share
    * rollup (SUM(CASE)/SUM over the same grouped pass) on top of q51's
    * join fan — customer-side nation restricted through region, supplier
    * nation carried into the numerator condition. The share is a ratio
    * of two exact-decimal sums from ONE aggregate, so no second pass
    * and no float accumulation order to reconcile. */
  val q52_market_share: Q = dual(
    "q52_market_share",
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region",
      "part"),
    s"""
      SELECT o_year,
             round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                 THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END)
                        AS DOUBLE) /
                   CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               n1.n_name AS supp_nation,
               $revenueSql AS volume
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n2.n_regionkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1999-01-01')
      GROUP BY o_year
      ORDER BY o_year""")

  /** TPC-H Q20 flavor (excess concentration): suppliers who shipped
    * MORE THAN HALF of some part's total volume in a year — the
    * supply-chain-risk readout of the "excess availability" idea,
    * restated on the tables this lake carries (no partsupp). Shape:
    * ONE lineitem pass with the ship-date range pushed to the scan,
    * aggregated to (part, supplier) BEFORE any window — the dominance
    * window rides the compact aggregate, never raw lineitem — and the
    * majority test is exact integer arithmetic (supp_qty * 2 >
    * part_qty, cross-multiplied — no float share, no ties ambiguity).
    * The supplier join is a broadcast of the bounded dimension. */
  val q53_dominant_supplier: Q = dual(
    "q53_dominant_supplier",
    Seq("lineitem", "supplier"),
    """
      WITH ps AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey),
      dom AS (
        SELECT l_suppkey, supp_qty
        FROM (SELECT l_suppkey, supp_qty,
                     SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
              FROM ps)
        WHERE supp_qty * 2 > part_qty)
      SELECT s_suppkey, s_name,
             CAST(COUNT(*) AS BIGINT) AS n_parts_dominated,
             CAST(SUM(supp_qty) AS BIGINT) AS dominated_qty
      FROM dom JOIN supplier ON s_suppkey = l_suppkey
      GROUP BY s_suppkey, s_name
      ORDER BY n_parts_dominated DESC, s_suppkey""")

  val all: Seq[Q] = Seq(q43_min_cost_supplier, q44_value_share,
    q45_small_qty_brand, q46_part_share_suppliers, q47_waiting_suppliers,
    q48_idle_rich_custs, q51_nation_trade, q52_market_share,
    q53_dominant_supplier)
}
