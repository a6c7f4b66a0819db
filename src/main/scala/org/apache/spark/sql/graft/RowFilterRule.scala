package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** Lake-Formation-style row security as a Catalyst rule (SURVEY §4's
  * optional `RowFilterRule`): when the session conf declares a restricted
  * role, every scan of the protected table is wrapped in a Filter — the
  * query text never changes, enforcement happens in the plan, and the
  * injected predicate participates in pushdown/partition pruning like any
  * user filter.
  *
  * Registered at runtime via `spark.experimental.extraOptimizations` (or
  * through SparkSessionExtensions at build time). Lives in the bridge
  * namespace because LogicalRelation and rule plumbing are sql-internal —
  * the standard seam for Catalyst extensions.
  *
  * ==Trust model — this rule is a plan-injection DEMO, not the
  * enforcement boundary==
  *
  * It covers every CATALOG-ATTRIBUTED scan shape: V1 `LogicalRelation`
  * with a catalogTable, Hive `HiveTableRelation`, and DSv2 relations
  * carrying an identifier — both `DataSourceV2Relation` (pre-optimization
  * injection) and `DataSourceV2ScanRelation` (what the relation has
  * already become by the time `extraOptimizations` runs, after
  * V2ScanRelationPushDown). Post-pushdown DSv2 wrapping only works while
  * the filter column survives column pruning — a query that never
  * references it gets an unfiltered scan, one more reason this rule is a
  * demo: real enforcement belongs at a pre-optimization seam (resolution
  * rule via SparkSessionExtensions) or in the catalog/storage layer.
  * Paths that BYPASS it, by design:
  *  - direct path reads of the underlying files
  *    (`spark.read.parquet(rawPrefix)`) — no catalog identity, no match
  *    (pinned by a spec case);
  *  - temp views defined over such reads;
  *  - `graft.rbac.role` is an ORDINARY session conf the caller can flip —
  *    there is no privilege separation inside a single Spark session.
  * The sound enforcement path is the role-scoped views plus
  * [[SqlRewrite.substituteTable]] (`Rbac.runAs`), where the caller never
  * controls the substitution; in a real deployment the storage ACL (not
  * the engine) is what makes direct path reads impossible. This mirrors
  * the reference, where Lake Formation enforces at the catalog/storage
  * seam rather than inside the query engine.
  *
  * Conf keys:
  *   graft.rbac.role   — role name; filtering applies when "core"
  *   graft.rbac.table  — protected table name
  *   graft.rbac.filter.column / .value — the row predicate (default
  *   endpoint='api-a', the reference's data-cells filter,
  *   rbac-demo/README.md:126)
  */
case class RowFilterRule(spark: SparkSession) extends Rule[LogicalPlan] {
  private val applied = TreeNodeTag[Boolean]("graft.rbac.applied")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = spark.conf
    val role = conf.get("graft.rbac.role", "")
    val table = conf.get("graft.rbac.table", "")
    if (role != "core" || table.isEmpty) return plan
    val column = conf.get("graft.rbac.filter.column", "endpoint")
    val value = conf.get("graft.rbac.filter.value", "api-a")
    def wrap(rel: LogicalPlan): LogicalPlan =
      rel.output.find(_.name == column) match {
        case Some(attr) =>
          rel.setTagValue(applied, true)
          Filter(EqualTo(attr, Literal(value)), rel)
        case None => rel
      }
    def fresh(rel: LogicalPlan): Boolean =
      !rel.getTagValue(applied).contains(true)
    plan.transformUp {
      case rel: LogicalRelation
          if rel.catalogTable.exists(_.identifier.table == table) &&
            fresh(rel) =>
        wrap(rel)
      case rel: HiveTableRelation
          if rel.tableMeta.identifier.table == table && fresh(rel) =>
        wrap(rel)
      // Matters when the rule is injected PRE-optimization (a resolution
      // rule via SparkSessionExtensions): at that point DSv2 tables are
      // still DataSourceV2Relation nodes.
      case rel: DataSourceV2Relation
          if rel.identifier.exists(_.name == table) && fresh(rel) =>
        wrap(rel)
      // Registered via extraOptimizations ("User Provided Optimizers"
      // batch), the rule runs AFTER V2ScanRelationPushDown has rewritten
      // every DataSourceV2Relation into DataSourceV2ScanRelation — this
      // arm is the one that fires on real optimized DSv2 queries.
      case rel: DataSourceV2ScanRelation
          if rel.relation.identifier.exists(_.name == table) && fresh(rel) =>
        wrap(rel)
    }
  }
}
