package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.classic

/** Parse-level table substitution for the RBAC entry point.
  *
  * `Rbac.runAs` must route every reference to the protected table to the
  * role's secured view. Doing that on the SQL *text* is unsound: SQL
  * identifiers are case-insensitive (`RAW_RBAC` would slip through and hit
  * the unsecured base table), the table may be referenced qualified
  * (`default.raw_rbac`), and the name can appear inside string literals or
  * as a substring of other identifiers, which a textual replace corrupts.
  *
  * The sound seam is the parsed plan: rewrite exactly the
  * [[UnresolvedRelation]] nodes that resolve to the protected table,
  * leaving literals, other identifiers, and CTE-shadowed names untouched —
  * the same place Spark's own view substitution happens.
  */
object SqlRewrite {

  /** Run `sqlText` with every table reference to `table` redirected to
    * `replacement` (resolved by the analyzer like any relation — here, a
    * role-scoped temp view). */
  def substituteTable(
      spark: SparkSession,
      sqlText: String,
      table: String,
      replacement: String): DataFrame = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val parsed = session.sessionState.sqlParser.parsePlan(sqlText)
    // A CTE named like the table shadows it (standard SQL scoping):
    // references inside that query mean the CTE, never the catalog table.
    val cteNames: Set[String] = parsed.collect {
      case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
    }.flatten.toSet
    val target = table.split('.').toSeq.map(_.toLowerCase)
    def matches(parts: Seq[String]): Boolean = {
      val p = parts.map(_.toLowerCase)
      p == target ||
        // unqualified protected table referenced through its default
        // namespace ("default.t", "spark_catalog.default.t")
        (target.length == 1 &&
          (p == "default" +: target ||
            p == Seq("spark_catalog", "default") ++ target))
    }
    def shouldRewrite(r: UnresolvedRelation): Boolean =
      matches(r.multipartIdentifier) &&
        !(r.multipartIdentifier.length == 1 &&
          cteNames(r.multipartIdentifier.head.toLowerCase))
    // transformUpWithSubqueries covers nested plans and plan-expressions
    // (scalar/IN/EXISTS subqueries) but NOT UnresolvedWith.cteRelations,
    // which are innerChildren — recurse into those explicitly.
    def rewrite(plan: LogicalPlan): LogicalPlan =
      plan.transformUpWithSubqueries {
        case w: UnresolvedWith =>
          w.copy(cteRelations = w.cteRelations.map { case (name, sa, id) =>
            (name, rewrite(sa).asInstanceOf[SubqueryAlias], id)
          })
        case r: UnresolvedRelation if shouldRewrite(r) =>
          r.copy(multipartIdentifier = Seq(replacement))
      }
    ofRows(spark, rewrite(parsed))
  }

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
