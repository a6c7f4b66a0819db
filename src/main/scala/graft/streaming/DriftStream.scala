package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming length-drift monitor — the streaming twin of batch
  * t22_length_drift ([[graft.queries.Text]]): crawl shards stream in and
  * every trigger emits, per source, the exact two-sample KS statistic
  * between the documents seen SO FAR and a fixed reference distribution
  * (the corpus profile the mix was designed against). The alarm a
  * pipeline wants the moment a source starts drifting — not at the next
  * nightly batch. Run over a whole corpus with the corpus's own profile
  * as the reference, the final per-source rows are identical to batch
  * t22 (`DriftStreamSpec`), shard-order-independent by construction
  * (state is a count histogram — a commutative monoid).
  *
  * Scale shape: state per source is a length histogram —
  * value-domain-bounded (~1e6 entries worst case), NEVER corpus-sized —
  * and the per-trigger KS recompute is one O(|grid|) pass over that
  * bounded map for the sources touched by the trigger only. The
  * reference ships in the task closure: same bound. Contrast with
  * [[DedupStream]] (per-bucket signature state) and
  * [[CurationStream]] (stateless gate): drift monitoring is the
  * bounded-state middle of the intake-pipeline spectrum.
  *
  * Determinism: the same all-integer cross-multiplied CDF comparison as
  * batch t22 — cum_s·n_ref vs cum_ref·n_s on the pooled value grid —
  * with the single final division and HALF_UP rounding mirroring
  * Spark's `round(…, 6)` exactly, so streamed and batch KS values are
  * bit-identical, not approximately equal.
  */
object DriftStream {
  /** One emitted monitor row: documents seen for the source so far, the
    * exact KS numerator (max |cum_s·n_ref − cum_ref·n_s|), and the
    * rounded statistic ks = ks_num / (n_docs·n_ref). */
  final case class Drift(source: String, n_docs: Long, ks_num: Long, ks: Double)

  /** Per-source state: observed length → count. */
  final case class Hist(counts: Map[Long, Long])

  /** Exact KS of `obs` against `ref` on their pooled value grid —
    * the same integer ladder as batch t22, in Scala. */
  private[streaming] def ks(
      obs: Map[Long, Long], ref: Map[Long, Long]): (Long, Long, Double) = {
    val nS = obs.valuesIterator.sum
    val nRef = ref.valuesIterator.sum
    val grid = (obs.keySet ++ ref.keySet).toSeq.sorted
    var cumS = 0L; var cumR = 0L; var best = 0L
    grid.foreach { v =>
      cumS += obs.getOrElse(v, 0L)
      cumR += ref.getOrElse(v, 0L)
      val d = math.abs(cumS * nRef - cumR * nS)
      if (d > best) best = d
    }
    // mirror batch t22 exactly: long product, one double division,
    // then Spark round()'s HALF_UP-on-toString-decimal semantics
    val raw = best.toDouble / (nS * nRef).toDouble
    val rounded = java.math.BigDecimal.valueOf(raw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    (nS, best, rounded)
  }

  /** Running per-source KS drift vs `refCounts` (length → count, the
    * reference profile). Update-mode streaming output: one row per
    * source per trigger that touched it. */
  def lengthDrift(
      docs: DataFrame, refCounts: Map[Long, Long]): Dataset[Drift] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("source", "n_chars").as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, Long)],
         st: org.apache.spark.sql.streaming.GroupState[Hist]) =>
          val cur = st.getOption.map(_.counts).getOrElse(Map.empty[Long, Long])
          val upd = rows.foldLeft(cur) { case (m, (_, v)) =>
            m.updated(v, m.getOrElse(v, 0L) + 1L)
          }
          st.update(Hist(upd))
          val (nS, num, rounded) = ks(upd, refCounts)
          Drift(source, nS, num, rounded)
      }
  }
}
