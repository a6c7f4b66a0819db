package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash / SimHash expressions.
  *
  * Semantics are EXACTLY the portable md5 formulas used by the SQL
  * oracles (see queries.Dedup):
  *   h1 = int(hex(md5(x))[0:15], 16) % 1000000007   (= first 60 bits >>> 4)
  *   h2 = int(hex(md5(x))[16:31], 16) % 1000000007  (= bytes 8..15 >>> 4)
  *   minhash sig[j] = min over shingles of (h1 + j*h2) % 1000000007
  *   simhash bit j  = sign of sum over tokens of +/-1 per bit of
  *                    int(hex(md5(t))[0:8], 16)
  * but computed from the raw digest bytes in one pass — no hex strings,
  * no interpreted lambda frames. The expression-tree fold evaluated
  * thousands of interpreted nodes per document; this is one JVM call
  * (CodegenFallback is fine: the heavy loop is inside).
  */
object HashExpressions {
  val P: Long = 1000000007L

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of the digest = big-endian bytes 0..7 >>> 4. */
  @inline private def hi60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** Hex digits 17..31 = big-endian bytes 8..15 >>> 4. */
  @inline private def lo60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 8
    while (i < 16) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** First 8 hex digits = big-endian bytes 0..3 as unsigned 32-bit. */
  @inline private def hi32(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v
  }

  def digest(bytes: Array[Byte]): Array[Byte] = {
    val m = md5Local.get()
    m.reset()
    m.digest(bytes)
  }

  /** Per-slot multipliers for the second digest half: 7^j mod P.
    * Slot j's hash is (a·(2j+1) + b·SlotC2(j)) mod P — a DIFFERENT
    * invertible linear combination of the shingle's two independent
    * digest halves per slot (pairwise determinants verified nonzero
    * mod P for all slot pairs), so slot minima are pairwise
    * independent. The previous progression h_j = (a + j·b) made slots
    * CORRELATED: one "hot" shingle with small (a, b) won entire bands,
    * and on a low-entropy corpus (fixed small vocabulary — boilerplate
    * at 100 TB, the synthetic corpus at sf1) every document containing
    * it landed in one LSH bucket: bucket sizes grew LINEARLY with the
    * corpus and candidate pairs QUADRATICALLY (measured: top bucket
    * 631 of 500k docs, 359k candidate pairs where ~10k are real; after
    * this fix the top bucket is near-dup-sized). Found by the round-11
    * second scaling decade. Shared formula with the DuckDB oracle
    * (`Dedup.signaturesSqlDuck`). */
  private val SlotC2: Array[Long] = Array(
    1L, 7L, 49L, 343L, 2401L, 16807L, 117649L, 823543L, 5764801L,
    40353607L, 282475249L, 977326736L, 841287110L, 889009735L,
    223068103L, 561476714L)

  def minhash(shingles: ArrayData, k: Int): Array[Long] = {
    require(k <= SlotC2.length, s"minhash supports <= ${SlotC2.length} slots")
    val sig = Array.fill(k)(P)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val d = digest(shingles.getUTF8String(i).getBytes)
      val a = hi60(d) % P
      val b = lo60(d) % P
      var j = 0
      while (j < k) {
        // a,b < P ~ 1e9; (2j+1) <= 31 and SlotC2 < P, so each product
        // stays under 1e18 — no Long overflow before the mod
        val h = (a * (2 * j + 1) + b * SlotC2(j)) % P
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  def simhash32(tokens: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = tokens.numElements()
    // distinct tokens, preserving the md5 formula over the SET
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (seen.add(t)) {
        val h = hi32(digest(t.getBytes))
        var j = 0
        while (j < 32) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** sig = 16 min-hashes of an array<string> of shingles; NULL for empty
  * input (mirrors the <3-token guard semantics). */
case class MinHashSignature(child: Expression, k: Int = 16)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) return null
    new GenericArrayData(HashExpressions.minhash(arr, k))
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** 32-bit SimHash of an array<string> of tokens (distinct-token votes);
  * NULL for empty input. */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) return null
    HashExpressions.simhash32(arr)
  }

  override protected def withNewChildInternal(c: Expression): SimHash32 =
    copy(child = c)
}

object HashFunctions {
  def minhash_sig(shingles: Column, k: Int = 16): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), k))
  def simhash32(tokens: Column): Column =
    Bridge.column(SimHash32(Bridge.expression(tokens)))
}
