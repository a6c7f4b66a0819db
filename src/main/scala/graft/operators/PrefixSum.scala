package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix scan (running sum) — the scale-safe
  * replacement for `sum(x).over(Window.partitionBy(g).orderBy(o))`.
  *
  * A per-group ordered window forces each group's ENTIRE row set through
  * one task (the round-7 t24 lesson, where one source's corpus-growing
  * vocabulary became a single-task sort). A prefix sum over a dominant
  * group at 100 TB has the same shape: `partitionBy(source)` with one hot
  * source is a one-task scan of most of the corpus. This operator keeps
  * the scan exact while bounding every task by the RANGE partition size,
  * not the group size:
  *
  *  1. `repartitionByRange(n, group ++ order)` — each task holds a
  *     contiguous key range, so partition id is monotone in key order and
  *     a dominant group is SPLIT across tasks;
  *  2. local exclusive prefix within (pid, group) — the window's
  *     partition key includes pid, so no window group exceeds one range
  *     partition's rows;
  *  3. per-(pid, group) totals → running offsets: a frame of at most
  *     n × |groups touched per partition| rows (task-count-sized, not
  *     data-sized), whose own per-group window is trivially cheap;
  *  4. broadcast the offset grid back and add.
  *
  * Determinism: `order` must totally order rows WITHIN each group (pass a
  * unique tie-break column); ties would make the prefix value
  * partition-placement-dependent. The input frame is cached once — the
  * pid assignment must be identical for the offsets branch and the data
  * branch (repartitionByRange samples boundaries; two independent
  * executions could disagree). At extreme scale substitute a checkpoint
  * for the cache; the algorithm is unchanged.
  *
  * The offset join is broadcast because the grid is n × groups-touched —
  * for a corpus keyed by source this is (tasks × sources). If `group` is
  * itself high-cardinality (per-user prefix sums over billions of users),
  * drop the `broadcast` hint and let the planner shuffle-join on
  * (pid, group) — correctness is unaffected.
  */
object PrefixSum {

  /** Exclusive running sum of `value` per `group`, ordered by `order`:
    * each row gets the sum of all STRICTLY EARLIER rows in its group
    * (0 for the first). Appends `out`; all input columns pass through. */
  def exclusive(
      df: DataFrame,
      group: Seq[String],
      order: Seq[String],
      value: String,
      out: String,
      numPartitions: Option[Int] = None): DataFrame = {
    require(order.nonEmpty, "order columns are required")
    val n = numPartitions.getOrElse(
      df.sparkSession.sparkContext.defaultParallelism)
    val keyCols = (group ++ order).map(col)
    val pid = "__ps_pid"
    val localCol = "__ps_local"
    val offCol = "__ps_off"
    val ranged = df.repartitionByRange(n, keyCols: _*)
      .withColumn(pid, spark_partition_id())
      .cache() // barrier: both consumers must observe ONE pid assignment
    val wLocal = Window.partitionBy(col(pid) +: group.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn(localCol,
      coalesce(sum(col(value)).over(wLocal), lit(0L)))
    val wOff = Window.partitionBy(group.map(col): _*)
      .orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(col(pid) +: group.map(col): _*)
      .agg(sum(col(value)).as("__ps_tot"))
      .withColumn(offCol, coalesce(sum(col("__ps_tot")).over(wOff), lit(0L)))
      .drop("__ps_tot")
    local
      .join(broadcast(offsets), pid +: group)
      .withColumn(out, col(localCol) + col(offCol))
      .drop(pid, localCol, offCol)
  }
}
