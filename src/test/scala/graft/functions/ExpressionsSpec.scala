package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions.{vec_dot, vec_norm}
import graft.functions.HashFunctions.{minhash_sig, simhash32}
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot: codegen result equals interpreted HOF formula") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))).toDF("a", "b")
    val rows = df.select(
      vec_dot(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
        .as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vec_dot: mixed float/double arrays and null propagation") {
    val df = Seq((Array(1.5f), Array(2.0))).toDF("f", "d")
    assert(df.select(vec_dot(col("f"), col("d"))).collect()(0).getDouble(0) == 3.0)
    val withNull = Seq((Option.empty[Array[Float]], Array(1.0f)))
      .toDF("f", "g")
    assert(withNull.select(vec_dot(col("f"), col("g"))).collect()(0).isNullAt(0))
  }

  test("vec_norm of unit vectors") {
    val df = Seq(Tuple1(Array(3.0f, 4.0f))).toDF("v")
    assert(df.select(vec_norm(col("v"))).collect()(0).getDouble(0) == 5.0)
  }

  test("minhash_sig equals the portable SQL formula") {
    val df = Seq(Tuple1(Array("a b c", "b c d", "c d e"))).toDF("sh")
    val native = df.select(minhash_sig(col("sh")).as("s")).collect()(0)
      .getSeq[Long](0)
    // the portable formula: per-slot independent combinations
    // (a·(2j+1) + b·7^j) mod P — HashExpressions.SlotC2's derivation
    val sqlSig = df.select(expr(
      """aggregate(
           transform(sh, x -> named_struct(
             'a', pmod(CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT), 1000000007),
             'b', pmod(CAST(conv(substr(md5(x), 17, 15), 16, 10) AS BIGINT), 1000000007))),
           transform(sequence(0, 15), j -> CAST(1000000007 AS BIGINT)),
           (acc, x) -> zip_with(acc, sequence(0, 15),
             (m, j) -> least(m, pmod(x.a * (2*j + 1) + x.b * element_at(
               array(1L, 7L, 49L, 343L, 2401L, 16807L, 117649L, 823543L,
                     5764801L, 40353607L, 282475249L, 977326736L,
                     841287110L, 889009735L, 223068103L, 561476714L),
               CAST(j + 1 AS INT)), 1000000007))))""").as("s"))
      .collect()(0).getSeq[Long](0)
    assert(native == sqlSig)
    assert(native.length == 16 && native.forall(v => v >= 0 && v < 1000000007L))
  }

  test("minhash_sig: identical shingle sets give identical signatures") {
    val df = Seq(
      Tuple1(Array("x y z", "y z w")),
      Tuple1(Array("y z w", "x y z"))).toDF("sh") // order must not matter
    val sigs = df.select(minhash_sig(col("sh"))).collect()
      .map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
  }

  test("minhash_sig and simhash32 are NULL on empty input") {
    val df = Seq(Tuple1(Array.empty[String])).toDF("sh")
    assert(df.select(minhash_sig(col("sh"))).collect()(0).isNullAt(0))
    assert(df.select(simhash32(col("sh"))).collect()(0).isNullAt(0))
  }

  test("simhash32: near-identical token sets differ in few bits") {
    val base = (1 to 40).map(i => s"tok$i").toArray
    val near = base.updated(0, "tokX")
    val far = (1 to 40).map(i => s"other$i").toArray
    val df = Seq(Tuple1(base), Tuple1(near), Tuple1(far)).toDF("t")
    val hs = df.select(simhash32(col("t"))).collect().map(_.getLong(0))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(0), hs(1)) < hamming(hs(0), hs(2)),
      s"near doc should be closer: ${hamming(hs(0), hs(1))} vs ${hamming(hs(0), hs(2))}")
    // duplicate tokens don't change the vote (distinct semantics)
    val dup = df.limit(1).select(simhash32(expr("concat(t, t)"))).collect()(0).getLong(0)
    assert(dup == hs(0))
  }
}
