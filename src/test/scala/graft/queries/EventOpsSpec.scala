package graft.queries

import graft.SparkSpec

/** Fixture tests for the event-sequence analytics that the hash-match
  * oracle can't pin by hand: q54's transition counts and row-level
  * probabilities on a controlled event log. */
class EventOpsSpec extends SparkSpec {

  test("q54 counts per-user consecutive transitions and normalizes rows") {
    // user 1: A -> B -> A -> C   (A->B, B->A, A->C)
    // user 2: A -> B             (A->B)
    // from A: A->B 2 (p=2/3), A->C 1 (p=1/3); from B: B->A 1 (p=1).
    // The C event closes user 1's sequence and emits nothing.
    import spark.implicits._
    val dir = tmpDir("q54fix")
    // ts as raw int64 nanoseconds — exercises the LongType branch of
    // Tables.normalizeTs (integer-divides down to µs timestamps). The
    // real testdata currently ships timestamp[us]; TestdataSchemaSpec is
    // the canary that pins what the files actually contain.
    def ts(sec: Int): Long = 1704067200L * 1000000000L + sec * 1000000000L
    Seq(
      (1L, ts(1), 1L, "A", 1.0, "{}"),
      (2L, ts(2), 1L, "B", 1.0, "{}"),
      (3L, ts(3), 1L, "A", 1.0, "{}"),
      (4L, ts(4), 1L, "C", 1.0, "{}"),
      (5L, ts(1), 2L, "A", 1.0, "{}"),
      (6L, ts(2), 2L, "B", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventAnalytics2.q54_event_transitions.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("A", "B") -> ((2L, 0.666667)),
      ("A", "C") -> ((1L, 0.333333)),
      ("B", "A") -> ((1L, 1.0))), s"got $got")
  }

  test("q54 breaks same-second ties by event_id, not arrival order") {
    // Both events land in the same second; event_id must decide the
    // sequence (the determinism contract shared with the DuckDB oracle,
    // which sees nanosecond timestamps where Spark sees microseconds).
    import spark.implicits._
    val dir = tmpDir("q54tie")
    // same second, different sub-second nanos: the HIGHER event_id gets
    // the EARLIER nano timestamp, so raw-ts order would say B -> A while
    // the second+event_id contract says A -> B
    val t = 1704067201L * 1000000000L
    Seq(
      (2L, t + 100L, 1L, "B", 1.0, "{}"),
      (1L, t + 900L, 1L, "A", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventAnalytics2.q54_event_transitions.run(spark, dir).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "A" && got.head.getString(1) == "B")
  }

  test("q54 probabilities sum to 1 per from_type at smoke scale") {
    val rows = EventAnalytics2.q54_event_transitions
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"$from: sum(p)=$p")
    }
  }
}
