package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition for `maint.mv_refresh_1p` (round-18 verdict item
  * 3: the largest maintenance row — 2.6 s warm for a 1%-change refresh
  * at sf0.1 — has never been mechanism-profiled). Same base/view/spec
  * shape as [[graft.Bench]]'s maintenance block, but one refresh is
  * replayed stage by stage with timers, the [[MaintProf]] discipline:
  * the profiled run IS a real refresh (every commit lands in order), so
  * state stays consistent and the timings sum to a real refresh total.
  *
  * Stages (names in the output line):
  *  - diff:       manifestAt x2 + changedKeysOf (metadata only)
  *  - schema:     view-schema read (type pinning)
  *  - delta:      signed delta build + cache materialization
  *  - auxplan:    sidecar tombstone/fresh-partials plan + its isEmpty
  *                probe (ONE full execution of auxChanges)
  *  - auxcommit:  SnapshotTable.applyChanges on the sidecar
  *  - rollup:     per-group extrema re-derivation off the sidecar
  *  - bucketprobe: affected-bucket distinct+collect off the cached delta
  *  - viewread:   bucket-pruned read of the current view
  *  - mergeexec:  ONE full execution of the merged view-changes plan
  *  - marker:     applied-version marker publish
  *  - viewcommit: SnapshotTable.applyChanges on the view
  *
  * Throwaway diagnostics — not part of the bench contract.
  * Usage: runMain graft.lake.MvProf <sfDir> [<sfDir> ...]
  */
object MvProf {
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
    import MaterializedAgg._
    import MaterializedAgg.MvSpec

    args.foreach { sfDir =>
      val sf = new java.io.File(sfDir).getName
      val mvBase = graft.core.IndexRoot.of(sfDir, "documents.parquet",
        "graft_mv_prof_base_v1")
      val mvRoot = graft.core.IndexRoot.of(sfDir, "documents.parquet",
        "graft_mv_prof_view_v1")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(mvBase))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(mvRoot))
      val docs = graft.core.Tables(spark, sfDir, "documents").select(
        col("doc_id"), col("lang"), col("n_chars"), col("source"))
      SnapshotTable.write(spark, mvBase, docs, Seq("source"),
        lookupFor = Seq("doc_id"))
      val spec = MvSpec(Seq("source"),
        sums = Seq("total_chars" -> "n_chars"), countName = "n_docs",
        mins = Seq("min_chars" -> "n_chars"),
        maxs = Seq("max_chars" -> "n_chars"))
      MaterializedAgg.init(spark, mvBase, mvRoot, spec, nBuckets = 8)
      val src0 = docs.select(col("source"))
        .distinct().limit(1).collect().head.getString(0)
      var i = 0
      def oneRowUpsert(): Unit = {
        i += 1
        SnapshotTable.upsert(spark, mvBase,
          spark.range(1).select(
            lit(2000000000L + i).as("doc_id"), lit("en").as("lang"),
            lit(i * 100L).as("n_chars"), lit(src0).as("source")),
          "doc_id", Seq("source"))
      }

      // --- refresh totals, the bench shape, 5x -------------------------
      val totals = (1 to 5).map { _ =>
        oneRowUpsert()
        time { MaterializedAgg.refresh(spark, mvBase, mvRoot, spec, 8) }._1
      }
      println(f"$sf mv refresh totals: ${totals.map(t => f"$t%.3f")
        .mkString(" ")}")

      // --- decomposed: the same work, stage by stage --------------------
      oneRowUpsert()
      val m = SnapshotTable.versions(spark, mvRoot).last
      val latestB = SnapshotTable.versions(spark, mvBase).last
      val applied = appliedAt(spark, mvRoot, m).get
      val (tDiff, (oldKeys, newKeys, newMap)) = time {
        val mOld = SnapshotTable.manifestAt(spark, mvBase, applied)
        val mNew = SnapshotTable.manifestAt(spark, mvBase, latestB)
        val changed = SnapshotTable.changedKeysOf(mOld, mNew)
        (changed.filter(mOld.entries.toMap.contains),
          changed.filter(mNew.entries.toMap.contains),
          mNew.entries.toMap)
      }
      val (tSchema, viewSchema) = time {
        SnapshotTable.read(spark, mvRoot, m).schema
      }
      val types = spec.effSums.map { case (n, _) => viewSchema(n).dataType }
      val mmTypes = spec.mmNames.map(n => viewSchema(n).dataType)
      def changedRows(keys: Set[String], v: Int): Option[DataFrame] =
        if (keys.isEmpty) None
        else Some(SnapshotTable.readPartitionKeys(spark, mvBase, keys, v))
      val (tDelta, deltaAll) = time {
        val added = changedRows(newKeys, latestB)
          .map(aggFrame(_, spec, types, 1))
        val removed = changedRows(oldKeys, applied)
          .map(aggFrame(_, spec, types, -1))
        val signed = (added.toSeq ++ removed.toSeq).reduce(_.unionByName(_))
        val deltaAggs =
          spec.effSums.zip(types).map { case ((n, _), t) =>
            sum(col(n)).cast(t).as(n) } ++
          spec.effSums.map { case (n, _) =>
            sum(col(nnName(n)))
              .cast(org.apache.spark.sql.types.LongType).as(nnName(n)) } :+
          sum(col(spec.countName))
            .cast(org.apache.spark.sql.types.LongType).as(spec.countName)
        val d = signed.groupBy(spec.groupBy.map(col): _*)
          .agg(deltaAggs.head, deltaAggs.tail: _*)
          .withColumn(KeyCol, keyExpr(spec))
          .withColumn(BucketCol, bucketExpr(8))
          .cache()
        d.count()
        d
      }
      val aRoot = auxRoot(mvRoot)
      val (tAuxPlan, auxChanges) = time {
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types.{StringType, StructField, StructType}
        val aux0 = SnapshotTable.read(spark, aRoot)
        val liveDirs = spark.createDataFrame(
          spark.sparkContext.parallelize(
            newMap.values.toSeq.map(Row(_)), 1),
          StructType(Seq(StructField("_live_dir", StringType))))
        val tombs = aux0.join(broadcast(liveDirs),
            col(DirCol) === col("_live_dir"), "left_anti")
          .withColumn("_mv_op", lit("d"))
        val fresh = changedRows(newKeys, latestB)
          .map(partialsFrame(_, spec, mmTypes, 8)
            .withColumn("_mv_op", lit("u")))
        // cached exactly as refresh caches it: the isEmpty probe
        // fills the cache, the commit's probe + write read it
        val a = (fresh.toSeq :+ tombs).reduce(_.unionByName(_)).cache()
        a.isEmpty // one full execution, as in refresh
        a
      }
      val (tAuxCommit, _) = time {
        SnapshotTable.applyChanges(spark, aRoot, auxChanges,
          key = AKeyCol, partitionBy = Seq(ABucketCol), opCol = "_mv_op")
      }
      auxChanges.unpersist(false)
      val (tRollup, roll) = time {
        val r = rollup(SnapshotTable.read(spark, aRoot), spec,
          deltaAll.select(col(KeyCol)))
        r.count(); r
      }
      val (tBucketProbe, buckets) = time {
        deltaAll.select(col(BucketCol)).distinct()
          .collect().map(_.getLong(0).toString).toSeq
      }
      val (tViewRead, current) = time {
        val c =
          if (buckets.isEmpty) SnapshotTable.read(spark, mvRoot, m).limit(0)
          else SnapshotTable.readPartitions(
            spark, mvRoot, buckets.map(Seq(_)), m)
        c.count(); c
      }
      // merged view-changes plan: THE SAME builder refresh commits
      // (MaterializedAgg.mergedViewChanges), so this profile cannot
      // drift from the real plan
      val viewChanges = mergedViewChanges(
        current, deltaAll, Some(roll), spec, types).cache()
      val (tMergeExec, _) = time { viewChanges.count() }
      val (tMarker, _) = time {
        writeSideFile(spark, mvRoot, f"applied-v${m + 1}%08d",
          latestB.toString, overwrite = false)
      }
      val (tViewCommit, _) = time {
        SnapshotTable.applyChanges(spark, mvRoot, viewChanges,
          key = KeyCol, partitionBy = Seq(BucketCol), opCol = "_mv_op")
      }
      viewChanges.unpersist(false)
      deltaAll.unpersist(false)
      println(f"$sf mv refresh stages: diff=$tDiff%.3f schema=$tSchema%.3f " +
        f"delta=$tDelta%.3f auxplan=$tAuxPlan%.3f auxcommit=$tAuxCommit%.3f " +
        f"rollup=$tRollup%.3f bucketprobe=$tBucketProbe%.3f " +
        f"viewread=$tViewRead%.3f mergeexec=$tMergeExec%.3f " +
        f"marker=$tMarker%.3f viewcommit=$tViewCommit%.3f")
    }
    spark.stop()
  }
}
