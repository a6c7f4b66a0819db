package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into sql-private constructors: Column <-> Expression.
  * Spark 4 removed the public `new Column(expr)` path; extensions that
  * ship custom Catalyst expressions (SparkSessionExtensions-style) use
  * exactly this internal seam. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-tag a batch frame as a streaming frame — what every V1
    * [[org.apache.spark.sql.execution.streaming.Source]] (file, Kafka)
    * does to the per-micro-batch plan it returns from `getBatch`:
    * MicroBatchExecution asserts `isStreaming` on the plan it splices
    * in, and `internalCreateDataFrame(_, _, isStreaming = true)` is the
    * one constructor that sets it. */
  def streamingFrame(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
