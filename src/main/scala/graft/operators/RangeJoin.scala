package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tolerance (band) join: pairs of rows whose numeric keys differ by at
  * most `tolerance`, within a partition key.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoop (O(n*m) and
  * broadcast-bound). The scalable form buckets both sides by
  * floor(t / tolerance), equi-joins each left bucket against right
  * buckets {b-1, b, b+1}, and refines with the exact predicate — an
  * equi-shuffle join with 3x fan-out instead of a cross product.
  */
object RangeJoin {
  def bucketed(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Long): DataFrame = {
    val lb = left.withColumn("_bucket",
      floor(col(leftTime) / tolerance))
    // right side replicated into its own and both neighbor buckets
    val rb = right.withColumn("_bucket",
      explode(array(
        floor(col(rightTime) / tolerance) - 1,
        floor(col(rightTime) / tolerance),
        floor(col(rightTime) / tolerance) + 1)))
    lb.join(rb, on :+ "_bucket")
      .filter(abs(col(leftTime) - col(rightTime)) <= tolerance)
      .drop("_bucket")
  }
}
