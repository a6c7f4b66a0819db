package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-query A/B for the dup-graph family (round 20): d12/d17/d19 in
  * the CURRENT shape vs the round-18 shape, interleaved in one JVM with
  * the bench's cache protocol (warmup run, 3 timed, clearCache between
  * query variants). The round-19 CcProf A/B timed the label LOOP only
  * (precomputed checkpointed edge set) and read "equal" while two
  * full-pack windows read the full queries ~1.8x their r18 refs — this
  * harness times what the bench times. Throwaway diagnostics.
  * Usage: runMain graft.tools.GraphProf <sfDir> [reps]
  */
object GraphProf {
  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  // ---- round-18 shapes, verbatim ------------------------------------

  private def oldCc(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    var labels = nodes.select(col("id"), col("id").as("label")).cache()
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
        .collect()(0).getDecimal(0))
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
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
    val out = labels.localCheckpoint(true)
    labels.unpersist(false)
    sym.unpersist(false)
    out
  }

  private def d12Shaped(
      s: SparkSession, dir: String,
      cc: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val edges = graft.queries.Dedup.d04_lsh_pairs.run(s, dir)
      .filter(col("est_sim") >= 0.5)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val labels = cc(
      graft.core.Tables(s, dir, "documents").select(col("doc_id").as("id")),
      edges)
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  private def d17Shaped(
      s: SparkSession, dir: String,
      cc: (DataFrame, DataFrame) => DataFrame): DataFrame =
    d12Shaped(s, dir, cc)
      .join(graft.core.Tables(s, dir, "documents")
        .select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("cluster_id"), 1L).otherwise(0L))
          .as("n_dups"),
        sum(when(col("cluster_size") > 1, 1L).otherwise(0L))
          .as("n_clustered"))
      .select(col("source"), col("n_docs"), col("n_dups"),
        col("n_clustered"),
        round(col("n_dups").cast("double") / col("n_docs").cast("double"),
          6).as("dup_share"))
      .orderBy(col("source"))

  private def oldD19(s: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    val pairs = graft.queries.Dedup.d04_lsh_pairs.run(s, dir)
      .filter(col("est_sim") >= 0.5)
      .select(col("a_id"), col("b_id"))
    val sym = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint(true)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = graft.core.Tables(s, dir, "documents").select(col("doc_id"))
      .localCheckpoint(true)
    var r = nodes.select(col("doc_id"), lit(1000000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = sym
        .join(r.withColumnRenamed("doc_id", "u"), col("src") === col("u"))
        .join(deg, "src")
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("in_sum"))
      r = nodes
        .join(contrib, nodes("doc_id") === contrib("dst"), "left")
        .select(col("doc_id"),
          expr("""CAST(150000000 + (CAST(85 AS DECIMAL(38,0)) *
                    coalesce(in_sum, CAST(0 AS DECIMAL(38,0)))) div 100
                  AS BIGINT)""").as("r"))
        .localCheckpoint(true)
    }
    r.select(col("doc_id"),
        round(col("r").cast("double") / 1e9, 6).as("pagerank"))
      .orderBy(col("doc_id"))
  }

  // fix candidate: graph-sized loop, but checkpoint the TINY converged
  // label table and return the corpus re-attach join UN-checkpointed
  // (the round-19 shape checkpointed the corpus-sized join output —
  // a |corpus| materialization to executor storage per query)
  private def fixCc(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).cache()
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
        .collect()(0).getDecimal(0))
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
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
    val small = labels.localCheckpoint(true) // graph-sized, cheap
    labels.unpersist(false)
    sym.unpersist(false)
    nodes.select(col("id"))
      .join(small.withColumnRenamed("id", "_cc_gid"),
        col("id") === col("_cc_gid"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  // fix2: graph-sized loop with (a) NO init labelSum action — when the
  // edge set is nonempty, round 1 strictly decreases the label sum (the
  // max endpoint of any edge adopts a smaller label), so the first
  // convergence compare is round2-vs-round1; an empty edge set just
  // converges after one cheap empty-frame round — and (b) the TINY
  // converged label table checkpointed, the corpus re-attach join
  // returned un-checkpointed.
  private def fix2Cc(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).cache()
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
        .collect()(0).getDecimal(0))
    var prevSum: Option[java.math.BigDecimal] = None
    var first = true
    var converged = false
    while (!converged) {
      val viaNbr = sym
        .join(labels.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
        .select(col("src").as("id"), col("label"))
      val next = labels.unionByName(viaNbr)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .cache()
      val nextSum = labelSum(next)
      converged = !first && nextSum == prevSum
      if (first && nextSum.isEmpty) converged = true // empty graph
      first = false
      prevSum = nextSum
      labels.unpersist(false)
      labels = next
    }
    val small = labels.localCheckpoint(true)
    labels.unpersist(false)
    sym.unpersist(false)
    nodes.select(col("id"))
      .join(small.withColumnRenamed("id", "_cc_gid"),
        col("id") === col("_cc_gid"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  // fix3: fix2 + round 1 collapsed to ONE aggregate. With identity
  // initial labels, round 1's join+union+groupBy is algebraically
  // next(id) = min(id, min(dst over (id,dst) in sym)) — a single
  // grouped aggregate over the symmetrized edges, no broadcast build,
  // no union. Rounds 2+ propagate as before.
  private def fix3Cc(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
        .collect()(0).getDecimal(0))
    var labels = sym.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .withColumnRenamed("src", "id")
      .cache()
    var prevSum = labelSum(labels)
    var converged = prevSum.isEmpty // empty graph
    while (!converged) {
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
    val small = labels.localCheckpoint(true)
    labels.unpersist(false)
    sym.unpersist(false)
    nodes.select(col("id"))
      .join(small.withColumnRenamed("id", "_cc_gid"),
        col("id") === col("_cc_gid"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  // fix3 for d19: fixD19 + no gnodes checkpoint (fused into each
  // iteration's checkpoint action) + iteration 1's contrib collapsed to
  // one aggregate (constant initial rank needs no rank join).
  private def fix3D19(s: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    val pairs = graft.queries.Dedup.d04_lsh_pairs.run(s, dir)
      .filter(col("est_sim") >= 0.5)
      .select(col("a_id"), col("b_id"))
    val sym0 = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint(true)
    val deg = sym0.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val sym = sym0.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint(true)
    val gnodes = sym.select(col("src").as("doc_id")).distinct()
    def update(contrib: DataFrame): DataFrame = gnodes
      .join(contrib, gnodes("doc_id") === contrib("dst"), "left")
      .select(gnodes("doc_id"),
        expr("""CAST(150000000 + (CAST(85 AS DECIMAL(38,0)) *
                  coalesce(in_sum, CAST(0 AS DECIMAL(38,0)))) div 100
                AS BIGINT)""").as("r"))
      .localCheckpoint(true)
    var r = update(sym
      .select(col("dst"), expr("1000000000 div outdeg").as("c"))
      .groupBy(col("dst"))
      .agg(sum(col("c").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .as("in_sum")))
    for (_ <- 2 to iters) {
      val contrib = sym
        .join(r.withColumnRenamed("doc_id", "u"), col("src") === col("u"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("in_sum"))
      r = update(contrib)
    }
    val restRank = if (iters >= 1) 150000000L else 1000000000L
    graft.core.Tables(s, dir, "documents").select(col("doc_id"))
      .join(r.withColumnRenamed("doc_id", "_pr_gid"),
        col("doc_id") === col("_pr_gid"), "left")
      .select(col("doc_id"),
        round(coalesce(col("r"), lit(restRank)).cast("double") / 1e9, 6)
          .as("pagerank"))
      .orderBy(col("doc_id"))
  }

  // fix candidate for d19: current shape but the edge pipeline is
  // checkpointed BEFORE deg attaches (the r19 shape evaluates the
  // uncached d04 pipeline twice inside the sym checkpoint action:
  // once under deg's aggregate, once under the join's left side)
  private def fixD19(s: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    val pairs = graft.queries.Dedup.d04_lsh_pairs.run(s, dir)
      .filter(col("est_sim") >= 0.5)
      .select(col("a_id"), col("b_id"))
    val sym0 = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint(true)
    val deg = sym0.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val sym = sym0.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint(true)
    val gnodes = sym.select(col("src").as("doc_id")).distinct()
      .localCheckpoint(true)
    var r = gnodes.select(col("doc_id"), lit(1000000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = sym
        .join(r.withColumnRenamed("doc_id", "u"), col("src") === col("u"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("in_sum"))
      r = gnodes
        .join(contrib, gnodes("doc_id") === contrib("dst"), "left")
        .select(gnodes("doc_id"),
          expr("""CAST(150000000 + (CAST(85 AS DECIMAL(38,0)) *
                    coalesce(in_sum, CAST(0 AS DECIMAL(38,0)))) div 100
                  AS BIGINT)""").as("r"))
        .localCheckpoint(true)
    }
    val restRank = if (iters >= 1) 150000000L else 1000000000L
    graft.core.Tables(s, dir, "documents").select(col("doc_id"))
      .join(r.withColumnRenamed("doc_id", "_pr_gid"),
        col("doc_id") === col("_pr_gid"), "left")
      .select(col("doc_id"),
        round(coalesce(col("r"), lit(restRank)).cast("double") / 1e9, 6)
          .as("pagerank"))
      .orderBy(col("doc_id"))
  }

  // phase-instrumented cc: prints per-phase wall times for the graph-
  // sized (fix) and corpus-sized (old) shapes
  private def ccPhases(
      nodes: DataFrame, edges: DataFrame, graphSized: Boolean,
      tag: String): DataFrame = {
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"  [$tag] $name=${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
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
    var prevSum = t("init")(labelSum(labels))
    var converged = false
    var round = 0
    while (!converged) {
      round += 1
      val viaNbr = sym
        .join(labels.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
        .select(col("src").as("id"), col("label"))
      val next = labels.unionByName(viaNbr)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .cache()
      val nextSum = t(s"round$round")(labelSum(next))
      converged = nextSum == prevSum
      prevSum = nextSum
      labels.unpersist(false)
      labels = next
    }
    val out =
      if (graphSized) {
        val small = t("ckpt")(labels.localCheckpoint(true))
        labels.unpersist(false)
        sym.unpersist(false)
        nodes.select(col("id"))
          .join(small.withColumnRenamed("id", "_cc_gid"),
            col("id") === col("_cc_gid"), "left")
          .select(col("id"), coalesce(col("label"), col("id")).as("label"))
      } else {
        val o = t("ckpt")(labels.localCheckpoint(true))
        labels.unpersist(false)
        sym.unpersist(false)
        o
      }
    out
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
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    // job counter: the per-variant scheduled-job delta names the floor
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    val newCc: (DataFrame, DataFrame) => DataFrame =
      graft.queries.Dedup.connectedComponents
    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("d12_old", () => d12Shaped(spark, dir, oldCc)),
      ("d12_new", () => d12Shaped(spark, dir, newCc)),
      ("d17_old", () => d17Shaped(spark, dir, oldCc)),
      ("d17_new", () => d17Shaped(spark, dir, newCc)),
      ("d19_old", () => oldD19(spark, dir)),
      ("d19_new", () =>
        graft.SparkEntry.queries("d19_dup_pagerank")(spark, dir)),
      ("d12_fix", () => d12Shaped(spark, dir, fixCc)),
      ("d17_fix", () => d17Shaped(spark, dir, fixCc)),
      ("d19_fix", () => fixD19(spark, dir)),
      ("d12_fix2", () => d12Shaped(spark, dir, fix2Cc)),
      ("d17_fix2", () => d17Shaped(spark, dir, fix2Cc)),
      ("d12_fix3", () => d12Shaped(spark, dir, fix3Cc)),
      ("d17_fix3", () => d17Shaped(spark, dir, fix3Cc)),
      ("d19_fix3", () => fix3D19(spark, dir)))
    if (sys.env.get("GRAPHPROF_PHASES").contains("1")) {
      (1 to 3).foreach { i =>
        Seq(true, false).foreach { gs =>
          val tag = (if (gs) "graph" else "corpus") + s"#$i"
          val t0 = System.nanoTime()
          d12Shaped(spark, dir,
            (n, e) => ccPhases(n, e, gs, tag)).count()
          println(f"  [$tag] d12_total=${(System.nanoTime() - t0) / 1e9}%.3f")
          spark.catalog.clearCache()
        }
      }
      spark.stop(); return
    }
    // warm the whole session once
    variants.foreach { case (_, f) => f().count(); spark.catalog.clearCache() }
    val results = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[(Double, Int)]]
    // rotate variant order per rep so session aging / checkpoint-block
    // accumulation cannot bias late-listed variants
    (0 until reps).foreach { rep =>
      val rotated = variants.drop(rep % variants.size) ++
        variants.take(rep % variants.size)
      rotated.foreach { case (name, f) =>
        f().count() // warmup repopulates intra-query caches
        val j0 = jobs.get()
        val t = time { f().count() }
        val nj = jobs.get() - j0
        results.getOrElseUpdate(name,
          scala.collection.mutable.ArrayBuffer.empty) += ((t, nj))
        spark.catalog.clearCache()
      }
    }
    variants.foreach { case (name, _) =>
      val rs = results(name).sortBy(_._1)
      val med = rs(rs.length / 2)
      println(f"$name%-9s min=${rs.head._1}%.2f med=${med._1}%.2fs " +
        s"jobs=${med._2} all=${rs.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
