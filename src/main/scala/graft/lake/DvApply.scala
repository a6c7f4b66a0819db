package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SQL-plane deletion-vector application (round 18): a
  * [[DataSourceV2Relation]] over a [[LakeTable]] whose pinned snapshot
  * carries live `#dv` lines is replaced by the dv-aware API read
  * ([[SnapshotTable.read]] — ManifestScan plus the broadcast
  * position anti-join), re-labeled to the relation's original
  * attribute ids so the surrounding plan is untouched. Tables without
  * deletion vectors — the steady state, since [[SnapshotTable.optimize]]
  * folds vectors into real bytes — never match, and keep the full
  * DSv2 path ([[LakePruningScanBuilder]] partition/sketch pruning).
  *
  * What a dv-carrying table trades while its vectors live: plan-time
  * directory pruning from pushed partition filters (parquet row-group
  * skipping and column pruning still apply — the replacement is a
  * HadoopFsRelation scan under the same pinned schema). That is the
  * deliberate cost model: vectors are transient repair state between a
  * row delete and the next OPTIMIZE, and correctness must not depend
  * on every DSv2 seam re-implementing the anti-join.
  *
  * Installed by [[graft.sql.GraftSqlExtensions]] AFTER
  * [[MetadataAggregate]] in the same injected-rule sequence, so a
  * metadata-answerable COUNT still answers from the manifest (with the
  * dv counts subtracted there) before this rule ever materializes a
  * scan. Runs before `V2ScanRelationPushDown` like its neighbor.
  *
  * Version semantics come free: the relation's [[LakeTable]] pins
  * `snapshotVersion`, and the replacement reads that exact version —
  * `VERSION AS OF` a pre-delete snapshot still serves the rows. */
object DvApply extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case rel: DataSourceV2Relation =>
      rel.table match {
        case lt: LakeTable => rewrite(rel, lt).getOrElse(rel)
        case _ => rel
      }
  }

  private def rewrite(
      rel: DataSourceV2Relation, lt: LakeTable): Option[LogicalPlan] =
    try {
      // flat-Snapshots roots serve through the same catalog with NO
      // keyedDirs (their manifests are not SnapshotTable manifests and
      // carry no dvs); an EMPTY snapshot table has no live dirs and so
      // no live dv either — both skip without touching the manifest
      if (lt.keyedDirs.isEmpty) return None
      val m = lt.manifest
      if (m.fileDvs.isEmpty) return None
      val liveDirs = m.entries.map(_._2).toSet
      def dirOf(rel0: String): String = {
        val i = rel0.lastIndexOf('/')
        if (i < 0) "" else rel0.substring(0, i)
      }
      if (!m.fileDvs.exists(d => liveDirs(dirOf(d._1)))) return None
      val spark = SparkSession.active
      // splice the OPTIMIZED sub-plan: the anti-join carries a
      // broadcast ResolvedHint, and the outer optimizer's hint
      // elimination has already run by the time this rule fires — an
      // un-optimized splice would trip the "ResolvedHint should have
      // been replaced" sanity check at execution. The inner optimize
      // cannot recurse: the replacement holds no LakeTable relation.
      val child = SnapshotTable
        .read(spark, lt.root, lt.snapshotVersion)
        .queryExecution.optimizedPlan
      // re-label by NAME onto the relation's attribute ids — the read
      // serves the same recorded schema, so the mapping must be total
      val aliased: Option[Seq[NamedExpression]] = {
        val out = rel.output.map { o =>
          child.output.find(a => conf.resolver(a.name, o.name))
            .map(src => Alias(src, o.name)(exprId = o.exprId))
        }
        if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
      }
      aliased.map(Project(_, child))
    } catch {
      // deliberately NOT a degrade: an unrewritten relation would
      // serve the raw files and silently RESURRECT deleted rows, the
      // one failure mode this feature must never have (the scan
      // builder's own fail-safe backs this up). Fail the query loudly
      // instead, with the table named.
      case scala.util.control.NonFatal(e) =>
        logError(
          s"DvApply could not rewrite the scan of ${lt.name()}; " +
            "failing the query rather than serving rows with the " +
            s"deletion vectors unapplied: $e")
        throw e
    }
}
