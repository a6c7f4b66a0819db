package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Plan a parquet scan over a KNOWN file list — names and byte sizes
  * supplied by the caller — with ZERO filesystem metadata calls at plan
  * time (round-15 verdict item 2, via the t47 profile: constructing
  * `spark.read.parquet(paths…)` lists every path eagerly on the driver,
  * ~2 ms per file locally and a billable LIST round-trip per path on
  * object stores; a 160-file table cost ~0.3 s PER QUERY before any
  * task ran).
  *
  * The graft lake manifest already IS the file census —
  * [[graft.lake.SnapshotTable]] records every live file's path and
  * byte size (`#sz` lines) at commit time — so query planning can
  * construct the [[FileIndex]] directly from metadata it has in hand,
  * the same trick Delta's `TahoeLogFileIndex` and Iceberg's planned
  * file scan tasks use: at 100 TB the difference between
  * O(files) LIST calls per query and zero is the planning latency of
  * the whole system.
  *
  * Execution is Spark's stock V1 parquet path (same as
  * `spark.read.schema(...).parquet(...)`): filter pushdown, column
  * pruning, vectorized reading, and file-split coalescing by
  * `maxPartitionBytes` all behave identically — only the plan-time
  * listing is gone, and `sizeInBytes` (the planner's broadcast
  * decision input) is the census' exact byte total instead of a
  * listing estimate. The synthetic [[FileStatus]]es carry mtime 0,
  * which nothing on this path consults (no FileStatusCache is
  * involved, and parquet footers are read by the tasks themselves).
  *
  * Cache-reuse contract: two scans over the same (schema, file set)
  * compare EQUAL ([[ManifestFileIndex.equals]] on the (path, size)
  * set, mirroring `InMemoryFileIndex`'s rootPaths equality), so
  * `df.cache()` on one call serves the next call's identical read —
  * the repeated-workload serving shape the retrieval paths rely on. */
object ManifestScan {

  /** One partition-less parquet relation over exactly `files`
    * ((absolute path, byte size)), read under `schema`. */
  def parquet(
      spark: SparkSession, schema: StructType,
      files: Seq[(String, Long)]): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val statuses = files.map { case (p, len) =>
      new FileStatus(len, false, 1, 128L << 20, 0L, new Path(p))
    }
    val relation = HadoopFsRelation(
      new ManifestFileIndex(statuses),
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty[String, String])(cs)
    classic.Dataset.ofRows(cs, LogicalRelation(relation, isStreaming = false))
  }
}

/** [[FileIndex]] served entirely from caller-supplied [[FileStatus]]es
  * — `listFiles` returns them verbatim (one partition-less directory),
  * `refresh` is a no-op (the file set IS the immutable snapshot the
  * manifest named), and equality is by (path, length) set so plan
  * canonicalization and cache lookup treat two reads of one snapshot
  * as the same relation. */
private[graft] final class ManifestFileIndex(files: Seq[FileStatus])
  extends FileIndex {

  override val rootPaths: Seq[Path] =
    files.map(_.getPath.getParent).distinct

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, files.toArray))

  override def inputFiles: Array[String] =
    files.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override val sizeInBytes: Long = files.map(_.getLen).sum

  override def partitionSchema: StructType = StructType(Nil)

  private lazy val key: Set[(String, Long)] =
    files.map(f => (f.getPath.toString, f.getLen)).toSet

  override def equals(other: Any): Boolean = other match {
    case m: ManifestFileIndex => key == m.key
    case _ => false
  }

  override def hashCode(): Int = key.hashCode()
}
