package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Per-key top-k as a first-class operator: logical node + strategy +
  * physical exec with MAP-SIDE PARTIAL REDUCTION.
  *
  * Top-k is algebraic (partial top-k's merge), so — exactly like partial
  * aggregation — each input partition reduces to k rows per key before
  * the exchange: shuffle volume is O(keys x k x partitions), not O(rows).
  * Note: since 3.5 Spark's InferWindowGroupLimit achieves the same
  * reduction for `row_number().over(...) <= k` filters (measured equal
  * shuffle volume in TopKPerKeySpec); this operator makes the mechanism
  * explicit, exposes it as a direct API without the window/filter idiom,
  * and replaces the per-partition full sort with bounded heaps.
  *
  * Plan shape: TopKPerKeyExec(final) <- Exchange <- TopKPerKeyExec(partial).
  * The final exec declares ClusteredDistribution so EnsureRequirements
  * inserts the exchange; the partial exec accepts any distribution.
  * Memory per task is O(keys-in-partition x k), the hash-aggregate class.
  */
case class TopKPerKeyLogical(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyLogical =
    copy(child = c)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering = GenerateOrdering.generate(sortOrder, childOutput)
      // per key: a bounded worst-first heap => O(log k) insert, the row
      // evicted is always the current worst
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      val worstFirst = rowOrdering.reverse
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (rowOrdering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach { h =>
        val rows = new Array[InternalRow](h.size)
        var i = rows.length - 1
        while (!h.isEmpty) { rows(i) = h.poll(); i -= 1 } // best-first
        out ++= rows
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Plans the logical node as partial -> (exchange via distribution) ->
  * final. Register with `spark.experimental.extraStrategies`. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyLogical(keys, order, k, child) =>
      val partialExec = TopKPerKeyExec(keys, order, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Top `k` rows per key, ordered by `order` (best first within key).
    * Installs the strategy on first use. */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies ++= Seq(TopKPerKeyStrategy)
    // Resolve the user's Columns through standard API plans (Spark 4
    // Columns are lazy column-nodes; only the stock analyzer paths turn
    // them into resolved catalyst expressions), then harvest them.
    val analyzedChild = df.queryExecution.analyzed
    val orderExprs = df.sort(order: _*).queryExecution.analyzed match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.order
      case other => throw new IllegalStateException(s"expected Sort, got $other")
    }
    val keyExprs = df.select(keys: _*).queryExecution.analyzed match {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.map(_.asInstanceOf[Expression])
      case other => throw new IllegalStateException(s"expected Project, got $other")
    }
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKPerKeyLogical(keyExprs, orderExprs, k, analyzedChild))
  }
}
