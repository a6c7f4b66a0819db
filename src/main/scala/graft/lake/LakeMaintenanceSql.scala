package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, StringType, TimestampType}

/** `OPTIMIZE lake.t` — the SQL spelling of
  * [[SnapshotTable.optimize]]: compact fragmented partitions toward
  * the byte target, candidates planned from the manifest's `#sz`
  * census alone (no listing sweep), rows untouched, ONE OCC commit,
  * history intact. Partition layout and cluster columns come from the
  * table's own recorded declarations — the statement names only the
  * table, like Delta's `OPTIMIZE`. Returns the resulting version
  * (the current latest when every partition is already at target). */
final case class OptimizeLakeTableCommand(table: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (root, pin) = LakeCatalog.resolveBinding(spark, table)
    if (pin.nonEmpty) throw new UnsupportedOperationException(
      s"OPTIMIZE $table: the binding pins @v${pin.get} — historical " +
        "states are immutable; rebind to latest to compact")
    val pby = SnapshotTable.partitionColumns(spark, root)
    if (pby.isEmpty) throw new UnsupportedOperationException(
      s"OPTIMIZE $table: no recorded partition columns (last commit " +
        "predates the #partitionby manifest line); run any API " +
        "mutation to record the layout first")
    Seq(Row(SnapshotTable.optimize(spark, root, pby)))
  }
}

/** `VACUUM lake.t RETAIN <n> VERSIONS` — the SQL spelling of
  * [[SnapshotTable.vacuum]]: drop all but the newest n manifests and
  * every data directory no kept version references (crashed-batch
  * debris included). Session-bound `@vN` pins survive regardless of
  * the horizon, exactly as in the API. The RETAIN clause is mandatory
  * — see [[graft.sql.GraftSqlParser]]. Same single-writer contract as
  * the API: do not run concurrently with a committer. */
final case class VacuumLakeTableCommand(table: String, keepVersions: Int)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("manifests_dropped", IntegerType, nullable = false)(),
    AttributeReference("data_dirs_deleted", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (root, _) = LakeCatalog.resolveBinding(spark, table)
    val (manifests, dirs) =
      SnapshotTable.vacuum(spark, root, keepVersions)
    Seq(Row(manifests, dirs))
  }
}

/** `RESTORE TABLE lake.t TO VERSION AS OF n` — the SQL spelling of
  * [[SnapshotTable.restore]]: rollback as ONE metadata-only OCC commit
  * whose live state equals v_n's; the bad versions stay readable until
  * vacuumed, and the change feed surfaces the restore as ordinary
  * delete/insert rows. Refusals: a `@vN`-pinned binding already names
  * an immutable historical state (rebind at latest to mutate), and a
  * flat snapshot layer has no folded manifest state to restate. */
final case class RestoreLakeTableCommand(table: String, toVersion: Int)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to_version", IntegerType,
      nullable = false)(),
    AttributeReference("version", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (root, pin) = LakeCatalog.resolveBinding(spark, table)
    if (pin.nonEmpty) throw new UnsupportedOperationException(
      s"RESTORE $table: the binding pins @v${pin.get} — it already " +
        "names an immutable historical state; rebind to latest before " +
        "restoring")
    if (!SnapshotTable.isTableRoot(spark, root))
      throw new UnsupportedOperationException(
        s"RESTORE $table: the binding is a flat snapshot layer (no " +
          "folded manifest state to restate); RESTORE applies to " +
          "SnapshotTable roots")
    Seq(Row(toVersion, SnapshotTable.restore(spark, root, toVersion)))
  }
}

/** `DESCRIBE HISTORY lake.t` — version discovery for the time-travel
  * surface ([[SnapshotTable.history]]): one row per retained version,
  * newest first, with the SAME commit clock `TIMESTAMP AS OF` resolves
  * against (manifest mtimes), so the two can never disagree. Cost is
  * one manifest-file read per retained version; no data access. */
final case class DescribeHistoryCommand(table: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("committed_at", TimestampType, nullable = false)(),
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("added_partitions", IntegerType, nullable = false)(),
    AttributeReference("removed_partitions", IntegerType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (root, _) = LakeCatalog.resolveBinding(spark, table)
    if (!SnapshotTable.isTableRoot(spark, root))
      throw new UnsupportedOperationException(
        s"DESCRIBE HISTORY $table: the binding is a flat snapshot " +
          "layer (no manifest log); history applies to SnapshotTable " +
          "roots")
    SnapshotTable.history(spark, root).sortBy(-_._1).map {
      case (v, ms, kind, added, removed) =>
        Row(v, new java.sql.Timestamp(ms), kind, added, removed)
    }
  }
}
