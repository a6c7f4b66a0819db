package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * optional clustering columns. */
  def writePartitioned(
      df: DataFrame,
      root: String,
      partitionBy: Seq[String],
      filesPerPartition: Int = 1,
      clusterBy: Seq[String] = Nil): Unit = {
    // repartition on the partition key => each output dir is written by
    // `filesPerPartition` tasks, not by every task (the small-file bomb)
    val keyed = df.repartition(
      filesPerPartition * df.sparkSession.sessionState.conf.numShufflePartitions
        .min(64),
      partitionBy.map(col): _*)
    val clustered =
      if (clusterBy.nonEmpty)
        keyed.sortWithinPartitions((partitionBy ++ clusterBy).map(col): _*)
      else keyed
    clustered.write
      .mode("overwrite")
      .partitionBy(partitionBy: _*)
      .parquet(root)
  }

  /** Rewrite a partitioned dataset to `targetFiles` files per partition
    * (compaction). Returns (filesBefore, filesAfter). */
  def compact(
      spark: SparkSession,
      root: String,
      partitionBy: Seq[String],
      targetFiles: Int = 1): (Long, Long) = {
    val before = countDataFiles(spark, root)
    val df = spark.read.parquet(root)
    val tmp = root.stripSuffix("/") + ".compacting"
    df.repartition(targetFiles, partitionBy.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionBy: _*).parquet(tmp)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root), true)
    fs.rename(new Path(tmp), new Path(root))
    (before, countDataFiles(spark, root))
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
