package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerKey

class TopKPerKeySpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("top-3 per customer equals the window formulation") {
    val orders = Tables(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val native = TopKPerKey(orders,
      keys = Seq(col("o_custkey")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, -t._3, t._2)).toSeq
    assert(canon(native) == canon(windowed))
    assert(canon(native).nonEmpty)
  }

  test("plan is partial topk -> exchange -> final topk (map-side reduction)") {
    val orders = Tables(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val df = TopKPerKey(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc), 2)
    df.count() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).length == 2, plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    // final (", 2, false") above the exchange, partial (", 2, true") below
    assert(plan.indexOf(", 2, false") < plan.indexOf("Exchange"), plan)
    assert(plan.indexOf("Exchange") < plan.indexOf(", 2, true"), plan)
  }

  test("partial phase reduces shuffle records vs the window idiom") {
    val orders = Tables(spark, "/root/testdata/sf0.01", "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val (_, windowShuffle) = graft.tools.ShuffleMeter.measure(spark) {
      orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).count()
    }
    val (_, nativeShuffle) = graft.tools.ShuffleMeter.measure(spark) {
      TopKPerKey(orders, Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3).count()
    }
    // Spark 3.5+ inserts WindowGroupLimit below the exchange for
    // row_number<=k filters, so the window idiom ALSO shuffles ~k rows
    // per (key, partition) — our explicit operator must match that
    // reduced volume (both far below the 15000 input rows).
    assert(nativeShuffle.recordsWritten <= windowShuffle.recordsWritten,
      s"native=$nativeShuffle window=$windowShuffle")
    val inputRows = orders.count()
    assert(nativeShuffle.recordsWritten < inputRows / 2,
      s"partial phase failed to reduce: $nativeShuffle vs $inputRows rows")
  }

  test("k larger than group size returns whole groups; k=1 returns argmax") {
    val ev = Tables(spark, sfDir, "events")
      .select("user_id", "event_id", "value")
    val all = TopKPerKey(ev, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id").asc), 1000000)
    assert(all.count() == ev.count())
    val arg = TopKPerKey(ev, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id").asc), 1)
    val exp = ev.groupBy("user_id").agg(max("value").as("mx")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    arg.collect().foreach { r =>
      assert(r.getDouble(2) == exp(r.getLong(0)))
    }
    assert(arg.count() == exp.size)
  }
}
