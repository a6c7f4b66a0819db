package graft.operators

import graft.SparkSpec
import graft.core.{Exact, Tables}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed tables join without exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      Scale.writeBucketed(
        Tables(spark, sfDir, "orders"), "orders_b", "o_orderkey", 8)
      Scale.writeBucketed(
        Tables(spark, sfDir, "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", 8)
      val joined = Scale.coLocatedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // measured, not just plan-shape: zero shuffle records move (collect,
      // not count — count()'s partial aggregation adds its own exchange)
      val (rows, shuffle) = graft.tools.ShuffleMeter.measure(spark) {
        joined.collect().length
      }
      assert(rows == 6000) // every lineitem matches its order
      assert(shuffle.recordsWritten == 0L, s"expected no shuffle: $shuffle")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join equals plain join") {
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val ord = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(ord, "l_orderkey")
    val salted = Scale.saltedJoin(li, ord, "l_orderkey", salts = 4)
    assert(salted.count() == plain.count())
    val a = plain.groupBy("l_orderkey").count().orderBy("l_orderkey").collect()
    val b = salted.groupBy("l_orderkey").count().orderBy("l_orderkey").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("salted aggregation equals direct aggregation") {
    val li = Tables(spark, sfDir, "lineitem")
    val direct = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum(Exact.dec(col("l_quantity"))).as("sum_value"))
      .orderBy("k").collect()
    val salted = Scale.saltedSum(
        li, col("l_returnflag"), Exact.dec(col("l_quantity")), salts = 8)
      .orderBy("k").collect()
    assert(direct.map(r => (r.getString(0), r.getDecimal(1))).toSeq ==
      salted.map(r => (r.getString(0), r.getDecimal(1))).toSeq)
  }
}
