package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
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
  *
  * CTE shadowing is tracked with the SAME scoping rules the analyzer's
  * `CTESubstitution` applies, not a global name set (the round-3 advisory
  * showed a global set is a bypass: `WITH t AS (SELECT * FROM t) ...`
  * must rewrite the inner `t` — a non-recursive CTE cannot see itself, so
  * that reference hits the catalog table — and a CTE buried in a derived
  * table must not shadow references OUTSIDE its own `WITH` subtree):
  *  - a CTE name is visible in the `WITH` clause's main query body;
  *  - it is visible in the definitions of LATER CTEs of the same clause;
  *  - it is visible inside its own definition only under `WITH RECURSIVE`;
  *  - visibility ends at the enclosing [[UnresolvedWith]] subtree;
  *  - subquery expressions inherit the scope of the plan node hosting
  *    them; only an unqualified reference can be shadowed.
  *
  * Namespace matching normalizes both the protected table and every
  * reference against the session's CURRENT catalog and namespace (the
  * round-3 advisory's second gap: hardcoding `default` misses a protected
  * table in another database, and misses unqualified references when the
  * session's current database IS the protected one).
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
    val cm = session.sessionState.catalogManager
    val currentCatalog = cm.currentCatalog.name.toLowerCase
    val currentNamespace = cm.currentNamespace.toSeq.map(_.toLowerCase)

    /** Fully qualify an identifier the way the analyzer would resolve it:
      * 1 part → current catalog + current namespace; 2+ parts without a
      * catalog → current catalog; otherwise as written. */
    def qualify(parts: Seq[String]): Seq[String] = {
      val p = parts.map(_.toLowerCase)
      p.length match {
        case 1 => (currentCatalog +: currentNamespace) ++ p
        case 2 => currentCatalog +: p
        case _ => p
      }
    }
    val target = qualify(table.split('.').toSeq)

    /** `scope` = CTE names visible at this point (lowercased). */
    def rewrite(plan: LogicalPlan, scope: Set[String]): LogicalPlan = {
      val structural = plan match {
        case w: UnresolvedWith =>
          // Definitions see earlier CTEs of the same clause; only a
          // recursive WITH lets a definition see its own name.
          var visible = scope
          val defs = w.cteRelations.map { case (name, defPlan, id) =>
            val defScope =
              if (w.allowRecursion) visible + name.toLowerCase else visible
            val rewritten = rewrite(defPlan, defScope).asInstanceOf[SubqueryAlias]
            visible += name.toLowerCase
            (name, rewritten, id)
          }
          w.copy(child = rewrite(w.child, visible), cteRelations = defs)
        case r: UnresolvedRelation =>
          val shadowed = r.multipartIdentifier.length == 1 &&
            scope(r.multipartIdentifier.head.toLowerCase)
          if (!shadowed && qualify(r.multipartIdentifier) == target)
            r.copy(multipartIdentifier = Seq(replacement))
          else r
        case other => other.mapChildren(rewrite(_, scope))
      }
      // Plan-expressions (scalar/IN/EXISTS/lateral subqueries) hosted on
      // this node carry nested plans of their own; they see this node's
      // scope. transformExpressionsDown stays on THIS node — children were
      // already handled by the structural recursion above.
      structural.transformExpressionsDown {
        case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan, scope))
      }
    }
    ofRows(spark, rewrite(parsed, Set.empty))
  }

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
