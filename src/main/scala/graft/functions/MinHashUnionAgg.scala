package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator unioning MinHash signatures (elementwise min).
  *
  * The MinHash union property: the signature of a UNION of sets is the
  * elementwise min of the sets' signatures — so a corpus-level signature
  * aggregates associatively/commutatively, exactly what a distributed
  * `Aggregator` needs (partial buffers per partition, arbitrary merge
  * order, same result). This is the sketch-style custom aggregate flagged
  * in SURVEY §2c, usable as a typed column over grouped Datasets.
  */
object MinHashUnionAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  val K = 16
  private val INF = HashExpressions.P

  def zero: Array[Long] = Array.fill(K)(INF)

  def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)

  def finish(buf: Array[Long]): Array[Long] = buf

  private lazy val enc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def bufferEncoder: Encoder[Array[Long]] = enc
  def outputEncoder: Encoder[Array[Long]] = enc
}
