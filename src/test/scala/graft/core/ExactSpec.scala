package graft.core

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** The integer-cents fast path must be VALUE-IDENTICAL to the decimal
  * ladder, not merely close: both feed oracle-hashed queries, so a single
  * ULP of drift is a correctness failure. Money inputs are exact 2-decimal
  * data; these properties pin that equivalence over randomized 2dp values,
  * including the float-representation error the real parquet carries
  * (prices arrive as `k/100.0` doubles, up to ~4e-9 off integer cents).
  */
class ExactSpec extends SparkSpec {
  // 2dp money like l_extendedprice (up to ~105k) and l_discount (0..0.10)
  // — deterministic ScalaCheck sampling, the PropertySpec pattern
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)))
  private val pairGen: Gen[(Long, Long)] = for {
    pc <- Gen.chooseNum(90000L, 10500000L)
    dc <- Gen.chooseNum(0L, 10L)
  } yield (pc, dc)

  test("revenueE4 equals the Decimal(18,6) ladder on every 2dp pair") {
    samples(pairGen, 2000).foreach { case (pc, dc) =>
      val price = pc / 100.0 // the same representation parquet carries
      val disc = dc / 100.0
      val exact = new java.math.BigDecimal(price)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .multiply(java.math.BigDecimal.ONE.subtract(
          new java.math.BigDecimal(disc)
            .setScale(6, java.math.RoundingMode.HALF_UP)))
      val e4 = Math.round(price * 100) * (100L - Math.round(disc * 100))
      assert(new java.math.BigDecimal(e4).movePointLeft(4)
        .compareTo(exact) == 0,
        s"cents=$e4 ladder=$exact for price=$price disc=$disc")
    }
  }

  test("grouped long sums match the decimal ladder through Spark itself") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(4000) { i =>
      (i % 37, (90000 + rng.nextInt(10410001)) / 100.0, rng.nextInt(11) / 100.0)
    }.toDF("k", "price", "disc")
    val viaCents = rows.groupBy($"k")
      .agg(Exact.moneyE4(sum(Exact.revenueE4($"price", $"disc"))).as("r"))
    val viaLadder = rows.groupBy($"k")
      .agg(Exact.money(sum(
        Exact.dec($"price") * (lit(java.math.BigDecimal.ONE).cast(Exact.D) -
          Exact.dec($"disc")))).as("r"))
    val a = viaCents.orderBy($"k").collect().map(r => r.getInt(0) -> r.getDouble(1))
    val b = viaLadder.orderBy($"k").collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(a.sameElements(b), "cents and ladder sums diverged")
  }

  test("decimal accumulator variant (low-cardinality grains) matches too") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(4000) { i =>
      (i % 3, (90000 + rng.nextInt(10410001)) / 100.0, rng.nextInt(11) / 100.0)
    }.toDF("k", "price", "disc")
    val big = rows.groupBy($"k")
      .agg(Exact.moneyE4(sum(Exact.e4big(Exact.revenueE4($"price", $"disc")))).as("r"))
    val long = rows.groupBy($"k")
      .agg(Exact.moneyE4(sum(Exact.revenueE4($"price", $"disc"))).as("r"))
    assert(big.orderBy($"k").collect().map(_.getDouble(1))
      .sameElements(long.orderBy($"k").collect().map(_.getDouble(1))))
  }
}
