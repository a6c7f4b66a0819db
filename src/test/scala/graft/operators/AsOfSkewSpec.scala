package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Skew guard for the as-of family (round-8 verdict item 6): event data
  * at 100 TB always has a hot key (a bot account, a default user_id), and
  * [[AsOf.join]]'s carry window puts that key's entire history in ONE
  * task — AQE cannot split a Window partition. [[AsOf.joinSkewSafe]]
  * shards the carry chain over deterministic time buckets; these cases
  * pin (a) exact equivalence to the reference plan under a 60%-hot key,
  * (b) that the hot key's work is genuinely sharded, (c) edge cases
  * (degenerate time domain, empty right side). */
class AsOfSkewSpec extends SparkSpec {

  import spark.implicits._

  // 1000 events, 60% on user 7 (the hot key), deterministic times with
  // collisions-free micros so ties cannot mask a stitch bug.
  private lazy val (purchases, signups) = {
    val rows = (0 until 1000).map { i =>
      val user = if (i % 5 < 3) 7L else (i % 37).toLong
      val te = 1700000000000000L + i * 1001L
      val isSignup = i % 3 == 0
      (user, i.toLong, te, isSignup)
    }
    val df = rows.toDF("user_id", "event_id", "te", "is_signup").cache()
    (df.filter(!col("is_signup"))
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("te").as("p_te")),
      df.filter(col("is_signup"))
        .select(col("user_id"), col("event_id").as("signup_id"),
          col("te").as("s_te")))
  }

  private def collectSorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("purchase_id").collect().toSeq

  test("skew-safe as-of is row-identical to the reference plan under a 60%-hot key") {
    val base = AsOf.join(purchases, signups, Seq("user_id"), "p_te", "s_te")
    val safe = AsOf.joinSkewSafe(
      purchases, signups, Seq("user_id"), "p_te", "s_te", buckets = 16)
    assert(safe.columns.toSeq == base.columns.toSeq)
    assert(collectSorted(safe) == collectSorted(base))
  }

  test("the hot key's carry chain is sharded: windows partition on (key, bucket)") {
    val safe = AsOf.joinSkewSafe(
      purchases, signups, Seq("user_id"), "p_te", "s_te", buckets = 16)
    safe.collect()
    val plan = safe.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(user_id[^,]*, _b".r.findFirstIn(plan).isDefined,
      s"carry window is not sharded by time bucket:\n$plan")
    // the boundary-stitch window over buckets is keyed per user (<=16
    // rows per key), and no window in the plan partitions on the bare
    // key with the full union as input — pin by checking the local
    // carry's windowspec always carries the _b column
    assert(!"windowspecdefinition\\(user_id#\\d+, _t".r.findFirstIn(plan).isDefined,
      s"a carry window still funnels a whole key through one task:\n$plan")
  }

  test("matches the oracle-gated q26 composition on real events") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = Tables(spark, sfDir, "events").select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("te"))
    val p = ev.filter(col("event_type") === "purchase").select(
      col("user_id"), col("event_id").as("purchase_id"), col("te").as("p_te"))
    val s = ev.filter(col("event_type") === "signup").select(
      col("user_id"), col("event_id").as("signup_id"), col("te").as("s_te"))
    val base = collectSorted(AsOf.join(p, s, Seq("user_id"), "p_te", "s_te"))
    val safe = collectSorted(
      AsOf.joinSkewSafe(p, s, Seq("user_id"), "p_te", "s_te", buckets = 8))
    assert(base.nonEmpty && safe == base)
  }

  test("degenerate time domain (all equal) collapses to one bucket, still exact") {
    val p = Seq((1L, 10L, 500L), (1L, 11L, 500L))
      .toDF("user_id", "purchase_id", "p_te")
    val s = Seq((1L, 20L, 500L), (2L, 21L, 500L))
      .toDF("user_id", "signup_id", "s_te")
    val base = collectSorted(AsOf.join(p, s, Seq("user_id"), "p_te", "s_te"))
    val safe = collectSorted(
      AsOf.joinSkewSafe(p, s, Seq("user_id"), "p_te", "s_te", buckets = 4))
    assert(safe == base)
    // the >= tie matches: both purchases see the equal-time signup
    assert(safe.forall(_.getAs[java.lang.Long]("asof_signup_id") == 20L))
  }

  test("empty right side: every left row survives with null payload") {
    val p = Seq((1L, 10L, 100L)).toDF("user_id", "purchase_id", "p_te")
    val s = Seq.empty[(Long, Long, Long)].toDF("user_id", "signup_id", "s_te")
    val safe = AsOf.joinSkewSafe(p, s, Seq("user_id"), "p_te", "s_te").collect()
    assert(safe.length == 1 && safe(0).isNullAt(safe(0).fieldIndex("asof_signup_id")))
  }
}
