package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into sql-private constructors: Column <-> Expression.
  * Spark 4 removed the public `new Column(expr)` path; extensions that
  * ship custom Catalyst expressions (SparkSessionExtensions-style) use
  * exactly this internal seam. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
