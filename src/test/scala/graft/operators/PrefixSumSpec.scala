package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The distributed two-pass prefix scan must be EXACTLY the per-group
  * ordered-window running sum — while never putting a whole group in one
  * window task (the round-7 t24 lesson, as a primitive). */
class PrefixSumSpec extends SparkSpec {

  private def naive(df: org.apache.spark.sql.DataFrame,
      group: Seq[String], order: Seq[String], value: String) = {
    val w = Window.partitionBy(group.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("expect", coalesce(sum(col(value)).over(w), lit(0L)))
  }

  test("matches the window cumsum on the real corpus (per-source)") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("v"))
    val got = PrefixSum.exclusive(docs, Seq("source"), Seq("doc_id"), "v", "cum")
      .select("doc_id", "cum")
    val want = naive(docs, Seq("source"), Seq("doc_id"), "v")
      .select(col("doc_id"), col("expect").as("cum"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "prefix sum diverges from the window cumsum")
  }

  test("exact under heavy skew — one group holding 90% of rows") {
    import spark.implicits._
    // 9000 rows in group "hot", 1000 spread over 10 cold groups: the hot
    // group MUST span multiple range partitions (that is the point).
    val rows = (0 until 9000).map(i => ("hot", i.toLong, (i % 7).toLong + 1)) ++
      (0 until 1000).map(i => (s"cold${i % 10}", i.toLong, (i % 5).toLong + 1))
    val df = spark.createDataset(rows).toDF("g", "ord", "v")
      .repartition(8) // scatter input so placement is adversarial
    val got = PrefixSum.exclusive(df, Seq("g"), Seq("ord"), "v", "cum",
      numPartitions = Some(8))
    val want = naive(df, Seq("g"), Seq("ord"), "v")
    val diff = got.join(want, Seq("g", "ord"))
      .where(col("cum") =!= col("expect")).count()
    assert(diff == 0, s"$diff rows diverge under skew")
    // and the hot group really was split: its rows must occupy >1 range
    // partition, else the test isn't exercising the offset stitching
    val parts = df.repartitionByRange(8, col("g"), col("ord"))
      .select(col("g"), org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .where(col("g") === "hot").select("p").distinct().count()
    assert(parts > 1, "hot group fit in one partition — weak test setup")
  }

  test("global prefix sum (no group columns)") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i % 3 + 1)).toDF("ord", "v")
    val got = PrefixSum.exclusive(df, Seq.empty, Seq("ord"), "v", "cum")
    val want = naive(df, Seq.empty, Seq("ord"), "v")
    val diff = got.join(want, Seq("ord"))
      .where(col("cum") =!= col("expect")).count()
    assert(diff == 0)
  }

  test("positions are parallelism-invariant (the t37 shuffle contract)") {
    // t37 hands PrefixSum positions to a data loader as "epoch 0
    // order" — they must be IDENTICAL regardless of how the input
    // arrives (1 partition, 7, 32): the range partitioner re-keys
    // rows by value, the in-partition window orders totally, and the
    // offsets derive from the same assignment. A placement-dependent
    // position would silently reorder training data between runs.
    import spark.implicits._
    val base = (1L to 500L).map(i => (i, s"k${i * 7919 % 501}"))
      .toDF("id", "k").withColumn("one", lit(1L))
    def positions(df: org.apache.spark.sql.DataFrame) =
      PrefixSum.exclusive(df, Seq.empty, Seq("k", "id"), "one", "pos")
        .select("id", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    val a = positions(base.coalesce(1))
    val b = positions(base.repartition(7))
    val c = positions(base.repartition(32, col("id")))
    assert(a == b && b == c,
      "prefix positions changed with input partitioning")
    assert(a.values.toSeq.sorted == (0L until 500L),
      "positions must be a contiguous 0-based permutation")
  }

  test("plan shape: windows keyed by partition id, offsets broadcast") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("v"))
    val df = PrefixSum.exclusive(docs, Seq("source"), Seq("doc_id"), "v", "cum")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the DATA window must include __ps_pid in its partition spec — a
    // windowspec keyed by source alone would be the one-task-per-group
    // shape this operator exists to avoid
    assert("windowspecdefinition\\(__ps_pid".r.findFirstIn(plan).isDefined,
      s"local prefix window not keyed by partition id:\n$plan")
    // the offset grid (task-count-sized) comes back as a broadcast join
    assert(plan.contains("BroadcastHashJoin"),
      s"offset grid not broadcast-joined:\n$plan")
  }
}
