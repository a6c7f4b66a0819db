package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the connected-components / PageRank loop shapes
  * (round 19): same d04 edge set, both label-propagation variants timed
  * in one JVM — corpus-sized labels (the pre-r19 shape) vs graph-sized
  * labels + final corpus re-attach. Throwaway diagnostics.
  * Usage: runMain graft.tools.CcProf <sfDir>
  */
object CcProf {
  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def ccLoop(
      spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      graphSized: Boolean): (DataFrame, Int) = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    var labels =
      (if (graphSized) sym.select(col("src").as("id")).distinct()
       else nodes)
        .select(col("id"), col("id").as("label")).cache()
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
        .collect()(0).getDecimal(0))
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      val viaNbr = sym
        .join(labels.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
        .select(col("src").as("id"), col("label"))
      val next = labels.unionByName(viaNbr)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .cache()
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels.unpersist(false)
      labels = next
    }
    val out =
      (if (graphSized)
        nodes.join(labels.withColumnRenamed("id", "_g"),
            col("id") === col("_g"), "left")
          .select(col("id"), coalesce(col("label"), col("id")).as("label"))
      else labels).localCheckpoint(true)
    labels.unpersist(false)
    sym.unpersist(false)
    (out, rounds)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nodes = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id").as("id"))
    // edge build timed once, shared shape with d12 (not under test);
    // the timed checkpoint IS the edge set the loops consume
    val t0 = System.nanoTime()
    val edges = graft.queries.Dedup.d04_lsh_pairs.run(spark, dir)
      .filter(col("est_sim") >= 0.5)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .localCheckpoint(true)
    val tEdges = (System.nanoTime() - t0) / 1e9
    println(f"edge build: $tEdges%.2fs, edges=${edges.count()}, " +
      s"nodes=${nodes.count()}")
    // warm both variants once, then 3 timed reps each, interleaved
    ccLoop(spark, nodes, edges, graphSized = false)._1.count()
    ccLoop(spark, nodes, edges, graphSized = true)._1.count()
    (1 to 3).foreach { i =>
      val tOld = time { ccLoop(spark, nodes, edges, graphSized = false)._1.count() }
      var r = 0
      val tNew = time {
        val (out, rounds) = ccLoop(spark, nodes, edges, graphSized = true)
        out.count(); r = rounds
      }
      println(f"rep $i: corpus-labels=$tOld%.2fs graph-labels=$tNew%.2fs rounds=$r")
    }
    // decade sweep: the SAME fixed edge set against synthetic corpora
    // 10x apart — the asymptotic claim in numbers. The label loop only
    // consumes node ids, so spark.range stands in for the corpus; ids
    // beyond the real docs are edge-free, exactly the restructure's
    // target population (at 100 TB the near-dup graph is a sliver of
    // the corpus). Median of 3 per cell, interleaved.
    Seq(5000L, 50000L, 500000L, 5000000L).foreach { n =>
      val syn = spark.range(n).select(col("id"))
      def med(gs: Boolean): Double = {
        ccLoop(spark, syn, edges, graphSized = gs)._1.count() // warm
        (1 to 3).map(_ =>
          time { ccLoop(spark, syn, edges, graphSized = gs)._1.count() })
          .sorted.apply(1)
      }
      val o = med(false); val g = med(true)
      println(f"decade n=$n%-8d corpus-labels=$o%.2fs graph-labels=$g%.2fs")
    }
    spark.stop()
  }
}
