package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for embedding math.
  *
  * The built-in route — `aggregate(zip_with(a, b, ...), ...)` — evaluates
  * interpreted (higher-order functions have no codegen) and allocates a
  * lambda frame per element: ~100x slower than a primitive loop for 64-dim
  * vectors, which dominates similarity search. This expression generates a
  * tight Java loop over the two ArrayData buffers (whole-stage-codegen
  * friendly), with an interpreted fallback implementing the same
  * element-order accumulation, so results are bit-identical to a serial
  * oracle that folds in array order.
  *
  * Accepts float or double element types on either side; accumulates in
  * double.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two `array<bigint>` columns — the scoring
  * kernel of the int8-quantized similarity path (s06). Exact 64-bit
  * arithmetic: for int8-range elements (|v| <= 127) and realistic
  * dimensionalities the accumulator is far from overflow (64 dims bounds
  * |dot| by ~1.03e6), so the result is bit-identical on any engine and
  * any partitioning — no floating-point rounding to reconcile at all.
  * Codegen'd tight loop for the same reason as [[DotProduct]]: the HOF
  * route (`aggregate(zip_with(...))`) evaluates interpreted per element.
  *
  * CONTRACT (the function is SQL-registered as `vec_qdot`, so arbitrary
  * `array<bigint>` inputs can reach it): mismatched lengths are truncated
  * to the SHORTER array — the zip semantics of every vector kernel here —
  * and the accumulator is unchecked 64-bit math, so inputs outside the
  * quantized-embedding envelope (|element| <= ~2^15 at dim <= ~2^30)
  * can wrap silently. Callers wanting strict behavior must validate
  * lengths/ranges upstream; the s06/s07 pipelines generate both sides
  * from the same 64-dim quantizer, which satisfies the contract by
  * construction.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_qdot expects array<bigint>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $a.getLong($i) * $b.getLong($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Element-order dot product of two numeric arrays, as a Column. */
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm. */
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  /** Exact integer dot product of two `array<bigint>` columns (s06). */
  def vec_qdot(a: Column, b: Column): Column =
    Bridge.column(LongDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
