package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming event-transition extractor — the streaming twin of batch
  * q54_event_transitions ([[graft.queries.EventAnalytics2]]): as events
  * stream in, emit one row per consecutive (from_type → to_type) step of
  * each user's sequence. Aggregating the emitted rows by (from, to)
  * reproduces q54's transition counts exactly (`TransitionStreamSpec`),
  * so the Markov matrix a product team watches can update per trigger
  * instead of per nightly batch.
  *
  * Scale shape: state per user is ONE (sec, event_id, event_type)
  * triple — constant-size regardless of history, the [[EventStreams]]
  * sessionize bound — and each trigger buffers only that user's rows
  * from the CURRENT micro-batch for the in-batch sort, never the
  * stream's past. Output is an append-only fact stream, so the
  * downstream count can run as an ordinary streaming aggregation or as
  * a batch rollup over the sink.
  *
  * Ordering contract (same as the batch twin's determinism rule): the
  * sequence position of an event is (second-truncated ts, event_id) —
  * ties inside one second are decided by event_id on BOTH engines, and
  * arrival order never matters within a trigger (rows are sorted before
  * state advances). Across triggers the source must deliver each user's
  * events in non-decreasing (sec, event_id) order — the log-shipping
  * guarantee; a transition spanning two triggers is stitched through
  * the carried state, emitted exactly once.
  */
object TransitionStream {
  /** Per-user carried state: the last event seen, by sequence order. */
  final case class Last(sec: Long, eventId: Long, eventType: String)

  /** One emitted fact: user took step from_type → to_type. */
  final case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Append-mode transition facts from an events stream with columns
    * (user_id, ts timestamp, event_id, event_type). */
  def transitions(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "CAST(unix_timestamp(ts) AS BIGINT) AS sec",
        "event_id", "event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, String)],
         st: org.apache.spark.sql.streaming.GroupState[Last]) =>
          // sort THIS batch's rows for the user into sequence order; the
          // buffer is one user's single-trigger slice, not history
          val sorted = rows.toIndexedSeq.sortBy(r => (r._2, r._3))
          var prev = st.getOption
          val out = Vector.newBuilder[Transition]
          sorted.foreach { case (_, sec, eid, tpe) =>
            prev.foreach(p => out += Transition(uid, p.eventType, tpe))
            prev = Some(Last(sec, eid, tpe))
          }
          prev.foreach(st.update)
          out.result().iterator
      }
  }
}
