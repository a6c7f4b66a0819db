package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for the two maintenance rows the round-16
  * verdict flagged (tok_refresh_1p, cdc_feed_step): same corpus and
  * batch shape as [[MaintBench]], but each refresh/feed stage timed
  * separately so a regression names its mechanism instead of a total.
  * Throwaway diagnostics — not part of the bench contract.
  *
  * Usage: graft.tools.MaintProf <sfDir> [<sfDir> ...]
  */
object MaintProf {
  private def time[T](body: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.lake.SnapshotTable
    import graft.operators.TokenizedCorpus
    import graft.queries.Search

    args.foreach { sfDir =>
      val sf = new java.io.File(sfDir).getName
      val zipfBase = graft.core.IndexRoot.of(sfDir, "documents.parquet",
        "graft_zipf_prof_base_v1")
      val zipfTok = graft.core.IndexRoot.of(sfDir, "documents.parquet",
        "graft_zipf_prof_tok_v1")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(zipfBase))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(zipfTok))
      Search.zipfTokRoot(spark, sfDir, "_prof")

      var batchId = 0L
      def onePartitionBatch(): Unit = {
        batchId += 1
        val d = spark.range(1).select(
          lit(8L * batchId).as("doc_id"),
          concat(lit("w128 w129 refreshed batch "),
            lit(batchId).cast("string")).as("text"),
          lit("p0").as("src"))
        SnapshotTable.upsert(spark, zipfBase, d, "doc_id", Seq("src"))
      }

      // --- refresh total, repeated 5x ---------------------------------
      val totals = (1 to 5).map { _ =>
        onePartitionBatch()
        time { TokenizedCorpus.refresh(spark, zipfBase, zipfTok,
          Seq("src")) }._1
      }
      println(f"$sf refresh totals: ${totals.map(t => f"$t%.3f")
        .mkString(" ")}")

      // --- decomposed: the same work, stage by stage -------------------
      onePartitionBatch()
      val latestB = SnapshotTable.latest(spark, zipfBase).get
      val applied = TokenizedCorpus.appliedBaseVersion(spark, zipfTok).get
      val (tDiff, changed) = time {
        val oldMap = SnapshotTable.entriesFor(spark, zipfBase, applied).toMap
        val newMap = SnapshotTable.entriesFor(spark, zipfBase, latestB).toMap
        (oldMap.keySet ++ newMap.keySet)
          .filter(k => oldMap.get(k) != newMap.get(k))
      }
      val (tRead, docs) = time {
        val d = SnapshotTable.readPartitionKeys(
          spark, zipfBase, changed, latestB)
        d.count(); d
      }
      val (tTok, tok) = time {
        val t = docs.withColumn("toks", expr(graft.queries.Text.toksExpr))
          .withColumn("dl", size(col("toks")).cast("long"))
          .where(col("dl") > 0).cache()
        t.count(); t
      }
      val (tPf, pf) = time {
        val p = tok.select(col("src"), col("doc_id"), col("dl"),
            explode(col("toks")).as("tok"))
          .groupBy(col("src"), col("doc_id"), col("dl"), col("tok"))
          .agg(count(lit(1)).as("tf")).cache()
        p.count(); p
      }
      val nullL = lit(null).cast("long")
      val (tUnion, merged) = time {
        val part = Seq(col("src"))
        val postRows = pf.select(
          part :+ col("doc_id") :+ col("dl") :+ col("tok") :+ col("tf"): _*)
        val dfRows = pf.groupBy(part :+ col("tok"): _*)
          .agg(count(lit(1)).as("tf"))
          .select(part :+ nullL.as("doc_id") :+ nullL.as("dl") :+
            col("tok") :+ col("tf"): _*)
        val statsRows = tok.groupBy(part: _*)
          .agg(count(lit(1)).as("tf"), sum(col("dl")).as("dl"))
          .select(part :+ nullL.as("doc_id") :+ col("dl") :+
            lit(TokenizedCorpus.StatsTok).as("tok") :+ col("tf"): _*)
        val m = postRows.unionByName(dfRows).unionByName(statsRows)
        m.count(); m
      }
      val (tCommit, _) = time {
        SnapshotTable.overwritePartitions(spark,
          new org.apache.hadoop.fs.Path(zipfTok, "postings").toString,
          merged, Seq("src"), dropKeys = changed,
          filesPerPartition = TokenizedCorpus.PostingsFiles)
      }
      pf.unpersist(false); tok.unpersist(false)
      println(f"$sf refresh stages: diff=$tDiff%.3f read=$tRead%.3f " +
        f"tok=$tTok%.3f pf=$tPf%.3f union=$tUnion%.3f commit=$tCommit%.3f")

      // --- feed step decomposed ----------------------------------------
      onePartitionBatch()
      val v = SnapshotTable.latest(spark, zipfBase).get
      val (tMeta, _) = time {
        SnapshotTable.entriesFor(spark, zipfBase, v - 1)
        SnapshotTable.entriesFor(spark, zipfBase, v)
      }
      val (tSchema, _) = time {
        SnapshotTable.read(spark, zipfBase, v).schema
      }
      val (tPlanOld, oldDf) = time {
        SnapshotTable.readPartitionKeys(spark, zipfBase, Set("p0"), v - 1)
      }
      val (tPlanNew, newDf) = time {
        SnapshotTable.readPartitionKeys(spark, zipfBase, Set("p0"), v)
      }
      val (tExec, _) = time {
        newDf.exceptAll(oldDf).count()
        oldDf.exceptAll(newDf).count()
      }
      val (tFeedTotal, _) = time {
        graft.lake.ChangeFeed.between(spark, zipfBase, v - 1, v).count()
      }
      println(f"$sf feed stages: meta=$tMeta%.3f schema=$tSchema%.3f " +
        f"planOld=$tPlanOld%.3f planNew=$tPlanNew%.3f exec2x=$tExec%.3f " +
        f"total=$tFeedTotal%.3f")
    }
    spark.stop()
  }
}
