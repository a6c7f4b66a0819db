package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with right time <= left time within the same key.
  *
  * Spark has no native ASOF join; the scalable composition is the
  * union+carry trick: tag both sides, sort within the key partition by
  * (time, side), and carry the last-seen right payload forward with an
  * ignore-nulls running `last`. ONE shuffle on the key — same cost as a
  * regular join — versus the naive inequality-join which explodes to a
  * per-key cross product and versus a broadcast of the whole right side.
  *
  * Ties: a right row at exactly the left time matches (>= semantics);
  * multiple right rows at the SAME key+time resolve by input order, so
  * pass a strictly-ordering time column (e.g. epoch micros) for full
  * determinism. Left and right must share only the `on` columns.
  */
object AsOf {
  def join(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(on.contains)
    val payload = right.columns.toSeq.filterNot(on.contains)

    val lPart = left.select(
      on.map(col) ++
        Seq(col(leftTimeCol).as("_t"), lit(1).as("_side")) ++
        leftRest.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"_r_$c")): _*)
    val rPart = right.select(
      on.map(col) ++
        Seq(col(rightTimeCol).as("_t"), lit(0).as("_side")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(c => col(c).as(s"_r_$c")): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.foldLeft(lPart.unionByName(rPart))((df, c) =>
      df.withColumn(s"_c_$c",
        last(when(col("_side") === 0, col(s"_r_$c")), ignoreNulls = true)
          .over(w)))
    carried
      .filter(col("_side") === 1)
      .select(
        (on ++ leftRest).map(col) ++
          payload.map(c => col(s"_c_$c").as(s"asof_$c")): _*)
  }

  /** Skew-safe as-of join: identical semantics to [[join]], but a hot
    * key never funnels through one task.
    *
    * [[join]]'s carry window is partitioned by the key alone, so a key
    * holding 50% of a 100 TB event stream (one bot account, one default
    * user_id) puts 50 TB in a single task — and AQE cannot help, because
    * skewed-partition splitting applies to joins, never to Windows
    * (a Window REQUIRES its whole partition in one task by contract).
    *
    * Mitigation: shard every key's carry chain over `buckets`
    * deterministic time ranges and stitch the chains back together —
    * the classic two-pass prefix scan:
    *   1. bucket `b` = the row's position in [min_t, max_t] split into
    *      `buckets` equal ranges (global min/max: one 2-long scalar
    *      aggregate, collected — bounded by construction). The bucket is
    *      a PURE FUNCTION of the row's time, so every consumer of the
    *      union computes identical assignments — no reliance on
    *      range-partitioner sampling being reused across plan branches;
    *   2. local carry within (key, bucket) — the hot key's chain now
    *      runs as `buckets` parallel tasks;
    *   3. per-(key, bucket) boundary summary: the LAST right payload of
    *      each bucket (one `max_by` row per key×bucket — sub-linear);
    *      a running carry over buckets (window over ≤`buckets` rows per
    *      key) yields each bucket's prefix = the last right row of all
    *      EARLIER buckets;
    *   4. stitch: rows whose local carry is null take the prefix. The
    *      join back is on (key, bucket) — the exact partitioning the
    *      local window just produced, so no extra shuffle of the data.
    *
    * Exactness: buckets are ordered, disjoint time ranges, so "last
    * right row at-or-before t" is either in t's own bucket (local carry,
    * which also sees `_side` ordering for the >= tie) or is the last
    * right row of an earlier bucket (prefix). Equal times always share a
    * bucket, so the tie rule is untouched. Degenerate input (all times
    * equal) collapses to bucket 0 = exactly [[join]]'s plan shape.
    * Equivalence under a 60%-hot key is pinned in `AsOfSkewSpec`.
    */
  def joinSkewSafe(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val leftRest = left.columns.toSeq.filterNot(on.contains)
    val payload = right.columns.toSeq.filterNot(on.contains)

    val lPart = left.select(
      on.map(col) ++
        Seq(col(leftTimeCol).cast("long").as("_t"), lit(1).as("_side")) ++
        leftRest.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"_r_$c")): _*)
    val rPart = right.select(
      on.map(col) ++
        Seq(col(rightTimeCol).cast("long").as("_t"), lit(0).as("_side")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(c => col(c).as(s"_r_$c")): _*)
    val u = lPart.unionByName(rPart)

    // Deterministic bucket boundaries: global [min, max] of the time key
    // (2 longs to the driver — bounded by construction). Equal-width
    // time ranges, not sampled quantiles: bursty data may still load
    // some buckets more than others, but assignment is reproducible on
    // every recompute of every plan branch, which sampled range
    // boundaries are not.
    val Array(mn, mx) = u.agg(min(col("_t")), max(col("_t")))
      .collect()(0) match {
      case r if r.isNullAt(0) => Array(0L, 0L) // both sides empty
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val span = math.max(1L, mx - mn + 1)
    val bucketOf = least(
      lit(buckets - 1),
      ((col("_t") - mn) * buckets / span).cast("int")).as("_b")

    val ub = u.withColumn("_b", bucketOf)
    // Local carry within each (key, bucket) shard.
    val wLocal = Window.partitionBy((on :+ "_b").map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val localCarried = payload.foldLeft(ub)((df, c) =>
      df.withColumn(s"_c_$c",
        last(when(col("_side") === 0, col(s"_r_$c")), ignoreNulls = true)
          .over(wLocal)))

    // Boundary summary: last right payload per (key, bucket), then each
    // bucket's prefix = running last over earlier buckets (<= `buckets`
    // rows per key — bounded by the parameter, not the data).
    val lastRight = ub.filter(col("_side") === 0)
      .groupBy((on :+ "_b").map(col): _*)
      .agg(max_by(
        struct(payload.map(c => col(s"_r_$c").as(c)): _*),
        col("_t")).as("_last"))
    val wPrefix = Window.partitionBy(on.map(col): _*).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // All buckets that carry data, from either side: left-only buckets
    // need a prefix row too.
    val prefixes = ub.select((on :+ "_b").map(col): _*).distinct()
      .join(lastRight, on :+ "_b", "left")
      .withColumn("_prev", last(col("_last"), ignoreNulls = true).over(wPrefix))
      .select((on :+ "_b").map(col) :+ col("_prev"): _*)

    val stitched = localCarried.join(prefixes, on :+ "_b", "left")
    stitched
      .filter(col("_side") === 1)
      .select(
        (on ++ leftRest).map(col) ++
          payload.map(c =>
            coalesce(col(s"_c_$c"), col("_prev").getField(c))
              .as(s"asof_$c")): _*)
  }
}
