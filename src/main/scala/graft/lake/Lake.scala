package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-layout management for the analytic (curated) zone: partitioned
  * parquet with controlled file counts and in-file clustering.
  *
  * The three knobs that decide 100 TB scan cost:
  *  - partition columns (directory pruning — queries on the partition key
  *    never open irrelevant files);
  *  - files per partition (small-file explosions turn a scan into
  *    millions of opens; compaction rewrites them to a target count);
  *  - in-file ordering (sortWithinPartitions clusters data so parquet
  *    row-group min/max stats skip non-matching groups).
  */
object Lake {
  /** Write partitioned parquet with per-partition file-count control and
    * optional clustering columns.
    *
    * Repartitioning on the partition key alone sends every row of one
    * partition value to a single task (1 file per directory regardless of
    * the knob); when `filesPerPartition > 1` a deterministic row-hash salt
    * joins the shuffle key so each directory is written by up to
    * `filesPerPartition` tasks. */
  def writePartitioned(
      df: DataFrame,
      root: String,
      partitionBy: Seq[String],
      filesPerPartition: Int = 1,
      clusterBy: Seq[String] = Nil): Unit = {
    val keyed = repartitionForLayout(df, partitionBy, filesPerPartition,
      df.sparkSession.sessionState.conf.numShufflePartitions.min(64) *
        filesPerPartition)
    val clustered =
      if (clusterBy.nonEmpty)
        keyed.sortWithinPartitions((partitionBy ++ clusterBy).map(col): _*)
      else keyed
    clustered.write
      .mode("overwrite")
      .partitionBy(partitionBy: _*)
      .parquet(root)
  }

  private[lake] def repartitionForLayout(
      df: DataFrame,
      partitionBy: Seq[String],
      filesPerPartition: Int,
      numPartitions: Int): DataFrame = {
    // guard (round-20, r19 advice item 1): repartition() with ZERO hash
    // expressions is a round-robin-less single-partition shuffle — an
    // empty partitionBy would silently send every row to one task. No
    // caller passes one today; fail loudly rather than degrade.
    require(partitionBy.nonEmpty,
      "repartitionForLayout needs at least one partition column")
    val keyCols = partitionBy.map(col)
    if (filesPerPartition <= 1)
      // no explicit partition count: every row of one partition key
      // lands in a single task either way (hash on the key), so the
      // file-per-directory contract is unchanged, but AQE COALESCES
      // the task count to the batch's actual size — a 300-row
      // maintenance commit stops scheduling 31 empty reducers. Note
      // AQE only ever coalesces small hash partitions; it cannot SPLIT
      // an oversized one (which is exactly what keeps one partition
      // key = one task = one file per directory safe) — a partition
      // key carrying more rows than one task should write must use
      // filesPerPartition > 1, whose salt branch below does the
      // splitting explicitly (round 19/20, optimization guide §2.2/§6)
      df.repartition(keyCols: _*)
    else {
      // The salt column must not collide with a real column: withColumn
      // would silently overwrite it and the drop below would corrupt the
      // dataset. Pick the first free name.
      val salt = Iterator.from(0).map {
        case 0 => "_graft_salt"
        case i => s"_graft_salt_$i"
      }.find(n => !df.columns.contains(n)).get
      df.withColumn(salt,
          pmod(hash(df.columns.map(col).toSeq: _*), lit(filesPerPartition)))
        .repartition(numPartitions, (keyCols :+ col(salt)): _*)
        .drop(salt)
    }
  }

  /** Rewrite a partitioned dataset to `targetFiles` files per partition
    * (compaction). Returns (filesBefore, filesAfter).
    *
    * The swap is crash-safe: the new layout is fully written to a temp
    * directory, the live directory is renamed aside, the temp renamed in,
    * and only then is the old data deleted. A crash at any point leaves a
    * complete copy of the data on disk — either live or under `.old`,
    * recoverable via [[recover]] — unlike delete-then-rename, which has a
    * window where the dataset exists nowhere. */
  def compact(
      spark: SparkSession,
      root: String,
      partitionBy: Seq[String],
      targetFiles: Int = 1,
      crashAfterSwapOut: Boolean = false): (Long, Long) = {
    val before = countDataFiles(spark, root)
    val df = spark.read.parquet(root)
    val tmp = root.stripSuffix("/") + ".compacting"
    repartitionForLayout(df, partitionBy, targetFiles,
      targetFiles * partitionValues(spark, root, partitionBy).max(1))
      .write.mode("overwrite").partitionBy(partitionBy: _*).parquet(tmp)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootP = new Path(root)
    val oldP = new Path(root.stripSuffix("/") + ".old")
    val tmpP = new Path(tmp)
    fs.delete(oldP, true) // leftover from an earlier crashed compaction
    if (!fs.rename(rootP, oldP))
      throw new java.io.IOException(s"compact: cannot move $rootP aside")
    if (crashAfterSwapOut) // test seam: simulated crash inside the window
      throw new java.io.IOException("simulated crash between swap phases")
    if (!fs.rename(tmpP, rootP)) {
      fs.rename(oldP, rootP) // roll back: old data becomes live again
      throw new java.io.IOException(s"compact: cannot move $tmpP into place")
    }
    fs.delete(oldP, true)
    (before, countDataFiles(spark, root))
  }

  /** Recover from a compaction crashed mid-swap: if the live directory is
    * missing but the `.old` copy exists, rename it back. Returns true when
    * a recovery was performed. */
  def recover(spark: SparkSession, root: String): Boolean = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootP = new Path(root)
    val oldP = new Path(root.stripSuffix("/") + ".old")
    if (!fs.exists(rootP) && fs.exists(oldP)) fs.rename(oldP, rootP)
    else false
  }

  private def partitionValues(
      spark: SparkSession, root: String, partitionBy: Seq[String]): Int =
    if (partitionBy.isEmpty) 1
    else {
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new Path(root)).count(s =>
        s.isDirectory && s.getPath.getName.contains("="))
    }

  // ---- Z-order (Morton) clustering ----------------------------------
  //
  // Linear sort clusters ONE dimension: a scan filtering on the sort
  // key skips most files via parquet min/max stats, but a filter on any
  // other column reads everything. Z-ordering interleaves the bits of
  // several dimensions so every file covers a small HYPER-RECTANGLE of
  // the value space — a selective filter on ANY z dimension then prunes
  // to ~|files|^((d-1)/d) instead of all of them. This is the standard
  // multi-dimensional layout for 100 TB fact tables queried along more
  // than one axis (the Delta/Iceberg OPTIMIZE ZORDER BY capability,
  // re-expressed with plain Spark + parquet stats).

  /** Morton interleave of pre-quantized non-negative long columns, each
    * in [0, 2^bits): bit i of column j lands at position i*n + j. All
    * shifts/masks compose into one codegen'd expression — no UDF.
    * n*bits must stay <= 63 (long z-value). */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"z-value needs n*bits <= 63, got ${cols.size} x $bits")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)),
          i * cols.size + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Equal-frequency quantization: code = #(boundaries <= value), with
    * 2^bits - 1 interior quantile boundaries. Unlike linear min/max
    * scaling, codes stay uniform under ANY value skew — a heavy-tailed
    * column would otherwise collapse most rows into a few codes and the
    * z-curve would lose locality exactly where the data is dense. The
    * boundary array is a broadcast-sized literal (2^bits doubles); the
    * per-row filter-count is codegen'd, no UDF. */
  def quantizeByFrequency(c: Column, boundaries: Seq[Double]): Column =
    size(filter(
      typedLit(boundaries),
      b => b.leq(c.cast("double")))).cast("long")

  /** Rewrite a dataset Z-ordered on `zCols`: one tiny quantile
    * aggregate ((2^bits - 1)·|zCols| scalars to the driver), then
    * range-partition + sort by the z-value so each of `numFiles` files
    * covers a compact box of RANK space. The z column is dropped from
    * the output — it exists only to drive layout; pruning happens
    * through parquet min/max stats on the ORIGINAL columns, which the
    * clustering makes tight (quantile codes are monotone in the raw
    * value, so a compact code box is a compact value box). */
  def writeZOrdered(
      df: DataFrame,
      root: String,
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 8): Unit = {
    val probs = (1 until (1 << bits))
      .map(i => i.toDouble / (1 << bits)).mkString(", ")
    val cuts = df.select(zCols.map(c =>
        expr(s"percentile_approx(CAST($c AS DOUBLE), array($probs), 10000)")
          .as(s"b_$c")): _*)
      .collect()(0)
    // An entirely-NULL z column yields NULL quantile boundaries and the
    // layout silently degenerates; fail loudly instead — the caller
    // picked a clustering column with no values to cluster on. Rows
    // with a NULL in a z column (partial nulls) quantize to code 0 by
    // construction (no boundary is <= NULL), i.e. NULLs cluster with
    // the lowest quantile box — documented behavior, analogous to
    // NULLS FIRST in a linear sort.
    zCols.zipWithIndex.foreach { case (c, i) =>
      require(!cuts.isNullAt(i),
        s"z column '$c' is entirely NULL — no quantile boundaries; " +
          "pick a populated clustering column")
    }
    val z = zValue(
      zCols.zipWithIndex.map { case (c, i) =>
        quantizeByFrequency(col(c), cuts.getSeq[Double](i))
      }, bits)
    val zName = Iterator.from(0).map {
      case 0 => "_graft_z"
      case i => s"_graft_z_$i"
    }.find(n => !df.columns.contains(n)).get
    df.withColumn(zName, z)
      .repartitionByRange(numFiles, col(zName))
      .sortWithinPartitions(col(zName))
      .drop(zName)
      .write.mode("overwrite").parquet(root)
  }

  // ---- partition-pruned upsert / delete -----------------------------
  //
  // Plain parquet has no MERGE INTO: the naive upsert rewrites the
  // whole dataset. At 100 TB that is the difference between a CDC batch
  // finishing in minutes and in a day — an upsert batch touches a
  // handful of partitions, so only THOSE directories should be read or
  // written. Same for GDPR-style deletes: the predicate names a
  // partition-pruned subset; everything else must not even be opened.
  //
  // Atomicity unit is the PARTITION DIRECTORY (the honest limit of a
  // log-less format: Delta/Iceberg buy multi-partition atomicity with a
  // commit log). Each touched directory goes through the compact()
  // swap — new data fully written to a temp root, live dir renamed
  // aside, temp renamed in, aside deleted — so a crash leaves every
  // partition either old, new, or recoverable via [[recoverUpsert]];
  // never half-written, never lost.

  /** Upsert `updates` into a dataset partitioned by `partitionBy`:
    * rows whose `key` exists are replaced, new keys are inserted. Only
    * partitions present IN THE UPDATE BATCH are read or rewritten —
    * the driver-side collect is the touched-partition value list,
    * bounded by the batch's partition spread, never the dataset's.
    * Updates must carry the dataset's full schema, and each key's
    * partition value must be stable across updates (the standard
    * partition-pruned-MERGE constraint: a key that MOVES partitions
    * leaves its old row in an untouched directory — to move a key,
    * include its old partition in the batch, e.g. via a tombstone row,
    * or run [[deleteWhere]] first). Returns the touched partition
    * count. */
  def upsert(
      spark: SparkSession,
      root: String,
      updates: DataFrame,
      key: String,
      partitionBy: String,
      crashAfterSwapOut: Boolean = false,
      filesPerPartition: Int = 1): Long = {
    // A batch with two rows for one key has no defined winner — the
    // anti-join+union would keep BOTH forever — and a NULL key can
    // never be replaced (the anti-join's equality never matches NULL).
    // Fail loudly on both, with the accurate message for each; reduce
    // duplicates upstream (CdcStream does, with a documented version
    // order). count(key) vs count(*) separates the two causes —
    // countDistinct alone ignores NULLs and would misreport a null-key
    // row as a duplicate.
    validateUpdateBatch(updates, key)
    // BEFORE the dataset read: spark.read.parquet captures the file
    // listing eagerly, so recovery after the read would still compute
    // the merge from a root missing the crashed-swap partition
    ensureRecovered(spark, root)
    val touched = touchedPartitions(updates, partitionBy)
    val live = spark.read.parquet(root)
      .filter(touchedPredicate(col(partitionBy), touched.map(_._1)))
    val merged = live
      .join(updates.select(col(key).as("_graft_k")),
        col(key) === col("_graft_k"), "left_anti")
      .unionByName(updates.select(live.columns.map(col): _*))
    rewriteTouched(spark, root, merged, partitionBy, touched,
      crashAfterSwapOut, filesPerPartition)
  }

  /** Restore any crashed-swap state and refuse to continue if a
    * partition could not be put back — a NON-EMPTY aside dir means some
    * partition may exist ONLY there, and proceeding would overwrite or
    * delete its sole copy. Idempotent and cheap when there is nothing
    * to recover. */
  private def ensureRecovered(spark: SparkSession, root: String): Unit = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val aside = new Path(root.stripSuffix("/") + ".upsert_old")
    if (fs.exists(aside)) {
      recoverUpsert(spark, root, partitionBy = "")
      if (fs.exists(aside))
        throw new java.io.IOException(
          s"unrecovered crashed-swap partitions remain under $aside; " +
            "refusing to overwrite the only surviving copy")
    }
  }

  /** Shared by [[upsert]] and [[SnapshotTable.upsert]] — one copy of the
    * NULL-key / duplicate-key batch contract. */
  private[lake] def validateUpdateBatch(updates: DataFrame, key: String): Unit = {
    val (nRows, nNonNullKeys, nKeys) = {
      val a = updates.agg(count(lit(1)), count(col(key)),
        countDistinct(col(key))).collect()(0)
      (a.getLong(0), a.getLong(1), a.getLong(2))
    }
    require(nRows == nNonNullKeys,
      s"upsert batch carries ${nRows - nNonNullKeys} NULL-key rows; " +
        "a null key cannot be matched for replacement")
    require(nNonNullKeys == nKeys,
      s"upsert batch carries ${nNonNullKeys - nKeys} duplicate-key rows; " +
        "reduce to one change per key first")
  }

  /** Touched partition values as (native value, Spark-rendered string):
    * the NATIVE value drives the membership predicate (so partition
    * pruning stays type-exact), while the STRING — produced by Spark's
    * own cast-to-string with the session timezone, the exact rendering
    * the partition-path writer uses — drives directory names. A JVM
    * toString would diverge for timestamp/date/decimal partition values
    * ('2026-01-01 00:00:00.0' vs the written '2026-01-01 00:00:00') and
    * the swap loop would miss or destroy those directories. */
  private[lake] def touchedPartitions(
      df: DataFrame, partitionBy: String): Seq[(Any, String)] =
    df.select(col(partitionBy), col(partitionBy).cast("string"))
      .distinct().collect()
      .map(r => (r.get(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSeq

  /** Membership predicate over the touched partition values. `isin`
    * alone silently never matches NULL (SQL three-valued logic), so a
    * null partition value gets its own IS NULL disjunct. */
  private def touchedPredicate(c: Column, touched: Seq[Any]): Column = {
    val nonNull = touched.filter(_ != null)
    val base =
      if (nonNull.isEmpty) lit(false) else c.isin(nonNull: _*)
    if (touched.exists(_ == null)) base || c.isNull else base
  }

  /** Delete rows matching `predicate`. Partitions with no matching row
    * are not read beyond the pruning scan and never rewritten. */
  def deleteWhere(
      spark: SparkSession,
      root: String,
      predicate: Column,
      partitionBy: String,
      filesPerPartition: Int = 1): Long = {
    ensureRecovered(spark, root) // see upsert: recover BEFORE the read
    val all = spark.read.parquet(root)
    val touched = touchedPartitions(all.filter(predicate), partitionBy)
    if (touched.isEmpty) return 0L
    val kept = all
      .filter(touchedPredicate(col(partitionBy), touched.map(_._1)))
      // keep every row where the predicate is NOT TRUE: a bare
      // !predicate drops NULL-valued rows too (three-valued logic),
      // silently deleting rows the predicate never matched
      .filter(coalesce(!predicate, lit(true)))
    rewriteTouched(spark, root, kept, partitionBy, touched,
      crashAfterSwapOut = false, filesPerPartition)
  }

  /** Restore any partition whose swap crashed between rename-aside and
    * rename-in: the live dir is missing but the aside copy exists.
    * Returns the number of partitions recovered. */
  def recoverUpsert(
      spark: SparkSession, root: String, partitionBy: String): Long = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val aside = new Path(root.stripSuffix("/") + ".upsert_old")
    if (!fs.exists(aside)) return 0L
    var n = 0L
    fs.listStatus(aside).foreach { st =>
      val live = new Path(root, st.getPath.getName)
      if (fs.exists(live))
        fs.delete(st.getPath, true) // stale duplicate: live copy exists
      else if (fs.rename(st.getPath, live)) n += 1
      // rename failed: LEAVE the aside entry — it is the only copy of
      // that partition; deleting the whole aside dir here would turn a
      // transient FS error into permanent data loss
    }
    if (fs.exists(aside) && fs.listStatus(aside).isEmpty)
      fs.delete(aside, true)
    n
  }

  private def rewriteTouched(
      spark: SparkSession,
      root: String,
      newData: DataFrame,
      partitionBy: String,
      touched: Seq[(Any, String)],
      crashAfterSwapOut: Boolean,
      filesPerPartition: Int = 1): Long = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val tmpRoot = root.stripSuffix("/") + ".upserting"
    val asideRoot = root.stripSuffix("/") + ".upsert_old"
    fs.delete(new Path(tmpRoot), true)
    // Callers ran ensureRecovered BEFORE reading the dataset; by here
    // the aside dir must be gone — if it reappeared (concurrent
    // writer), refuse rather than delete the only copy of a partition.
    ensureRecovered(spark, root)
    // filesPerPartition > 1 threads writePartitioned's row-hash salt
    // through the rewrite: without it a CDC batch touching ONE hot
    // partition (the common skew case) rewrites that whole directory
    // through a single task and emits one file — at 100 TB the rewrite
    // serializes on one core (round-8 verdict #3). The salt keeps the
    // directory layout identical (partitionBy drives the directories;
    // the salt only spreads rows across up to `filesPerPartition`
    // writer tasks per directory).
    repartitionForLayout(newData, Seq(partitionBy), filesPerPartition,
      touched.size.max(1) * filesPerPartition.max(1))
      .write.mode("overwrite").partitionBy(partitionBy).parquet(tmpRoot)
    fs.mkdirs(new Path(asideRoot))
    // swap each touched directory; an update batch can contain a
    // partition value with zero surviving rows (all deleted) — then the
    // tmp dir is absent and the live dir is simply retired. Directory
    // names use Spark's OWN Hive escaping (source=a:b is written as
    // source=a%3Ab; null as __HIVE_DEFAULT_PARTITION__) — a raw
    // "$col=$v" would miss those directories entirely and silently
    // discard the merged data for them.
    touched.foreach { case (_, rendered) =>
      val dir = partitionDirName(partitionBy, rendered)
      val live = new Path(root, dir)
      val tmp = new Path(tmpRoot, dir)
      val old = new Path(asideRoot, dir)
      if (fs.exists(live) && !fs.rename(live, old))
        throw new java.io.IOException(s"upsert: cannot move $live aside")
      if (crashAfterSwapOut) // test seam: crash inside the swap window
        throw new java.io.IOException("simulated crash between swap phases")
      if (fs.exists(tmp) && !fs.rename(tmp, live)) {
        fs.rename(old, live) // roll back this partition
        throw new java.io.IOException(s"upsert: cannot move $tmp into place")
      }
    }
    fs.delete(new Path(asideRoot), true)
    fs.delete(new Path(tmpRoot), true)
    touched.size.toLong
  }

  /** The directory name Spark itself writes for a partition value —
    * `rendered` must come from [[touchedPartitions]]' cast-to-string
    * (Spark's own rendering), never JVM toString. */
  private def partitionDirName(colName: String, rendered: String): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val value =
      if (rendered == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      else ExternalCatalogUtils.escapePathName(rendered)
    s"${ExternalCatalogUtils.escapePathName(colName)}=$value"
  }

  def countDataFiles(spark: SparkSession, root: String): Long = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(root), true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}
