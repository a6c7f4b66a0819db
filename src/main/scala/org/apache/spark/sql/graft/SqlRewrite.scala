package org.apache.spark.sql.graft

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{ExpressionWithUnresolvedIdentifier, PlanWithUnresolvedIdentifier, UnresolvedExecuteImmediate, UnresolvedRelation}
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
  *
  * Late-bound names fail closed: `IDENTIFIER(<expr>)` (and its expression
  * form) and `EXECUTE IMMEDIATE` bind relations during ANALYSIS — after
  * this rewrite — so queries using them are rejected outright instead of
  * running unsecured. runAs is a QUERY-only entry point (the reference's
  * Athena SELECT path): statements — DML/DDL and metadata commands like
  * SHOW PARTITIONS / DESCRIBE — are rejected wholesale, both because they
  * execute eagerly on Dataset construction (before any check could fire)
  * and because they resolve through paths the substitution does not
  * cover.
  *
  * File-path relations fail closed STRUCTURALLY, twice over, with no
  * session state touched (an earlier revision flipped
  * `spark.sql.runSQLOnFiles` around the analysis — a session-global,
  * non-reentrant toggle: two concurrent runAs calls raced, one `finally`
  * restoring the conf while the other's analysis was in flight, and the
  * flip also briefly broke unrelated concurrent path-read queries on the
  * same session):
  *  1. at PARSE time, format-shaped relations (``parquet.`/path` ``, a
  *     dotted datasource class name, or a `/`-containing second part)
  *     are rejected before analysis can resolve them;
  *  2. at the BACKSTOP, under runAs only relations with a catalog
  *     identity may appear outside the sanctioned role-view subtree — a
  *     leaf with no `catalogTable` (the shape of every path read,
  *     including one smuggled through a pre-existing view, which the
  *     parse check cannot see) or a DSv2 relation with no identifier is
  *     denied regardless of which path it reads. A table in a database
  *     named like a file format (`parquet.t`) is denied by check 1 —
  *     an acceptable fail-closed edge for an access-control entry point.
  * The backstop verdict lands BEFORE any Dataset exists, and the Dataset
  * that is returned is built from the very plan the backstop audited
  * (re-analyzing the parsed plan would be a TOCTOU window: session state
  * such as temp views could rebind between verdict and execution). For
  * routes the parser cannot reveal at all (a pre-existing view whose
  * body references the protected table), the post-analysis backstop
  * walks the analyzed plan and denies any route to the base relation
  * that does not canonicalize to the role view. substituteTable mutates
  * no shared state, so concurrent calls on one session are safe.
  *
  * Known semantic choice: under runAs an unqualified reference to the
  * protected name ALWAYS means the secured table — a same-named user temp
  * view does not shadow it (shadowing would let callers pre-empt the
  * predictable name and confuse audits); and a CTE named like the role
  * view itself is rejected rather than silently captured.
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
      * 1 part → current catalog + current namespace; multi-part names get
      * the current catalog prepended unless their head already names a
      * registered catalog (Spark resolves `cat.ns.tbl` and `cat.tbl`
      * catalog-first). */
    def qualify(parts: Seq[String]): Seq[String] = {
      val p = parts.map(_.toLowerCase)
      p.length match {
        case 1 => (currentCatalog +: currentNamespace) ++ p
        case _ if cm.isCatalogRegistered(p.head) => p
        case _ => currentCatalog +: p
      }
    }
    val target = qualify(table.split('.').toSeq)

    // Fail closed on late-bound names: IDENTIFIER(<expr>) resolves to a
    // relation DURING ANALYSIS, after this parse-level rewrite ran — a
    // caller could smuggle the protected table through it ("SELECT * FROM
    // IDENTIFIER('raw_rbac')" never contains an UnresolvedRelation here).
    // No legitimate runAs query needs computed table names, so reject the
    // construct outright rather than allow the bypass.
    def deny(message: String) = new AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> message))
    def lateBoundError(construct: String) = deny(
      s"$construct is not allowed under runAs: it binds relations " +
        "after access-control substitution")
    def rejectLateBound(plan: LogicalPlan): Unit = plan.foreach { node =>
      if (node.isInstanceOf[PlanWithUnresolvedIdentifier])
        throw lateBoundError("IDENTIFIER()")
      if (node.isInstanceOf[UnresolvedExecuteImmediate])
        throw lateBoundError("EXECUTE IMMEDIATE")
      // runAs is a QUERY entry point (the reference's Athena SELECT path).
      // Statements are rejected wholesale: DML/DDL would execute EAGERLY
      // when the Dataset is constructed (leaking before any check could
      // fire), and metadata commands (SHOW PARTITIONS, DESCRIBE) resolve
      // through UnresolvedTableOrView — a path the substitution does not
      // cover — exposing partition values and storage locations.
      if (node.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Command] ||
          node.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.ParsedStatement])
        throw deny("only queries are allowed under runAs: statements " +
          "(DML/DDL/metadata commands) execute outside the " +
          "access-control substitution")
      node match {
        // CTE definitions are innerChildren, invisible to foreach —
        // recurse explicitly or IDENTIFIER() hides inside a WITH clause.
        case w: UnresolvedWith =>
          w.cteRelations.foreach { case (_, defPlan, _) =>
            rejectLateBound(defPlan)
          }
        // Format-shaped relations (SELECT-on-files): reject at parse time
        // so the analyzer never resolves a path, whatever
        // spark.sql.runSQLOnFiles holds. The match is deliberately a
        // superset of Spark's own `format.\`path\`` rule — a known format
        // token, a dotted head (datasource CLASS names like
        // org.apache...parquet resolve too), or a `/` in the second part
        // all deny. The structural backstop below catches anything
        // format-shaped this misses.
        case r: UnresolvedRelation if r.multipartIdentifier.length == 2 =>
          val head = r.multipartIdentifier.head.toLowerCase
          if (FileFormatTokens(head) || head.contains('.') ||
              r.multipartIdentifier(1).contains('/'))
            throw deny(
              s"file-path relations (`$head`.`...`) are not allowed under " +
                "runAs: path reads bypass table-level access control")
        case _ => ()
      }
      node.expressions.foreach(_.foreach {
        case _: ExpressionWithUnresolvedIdentifier =>
          throw lateBoundError("IDENTIFIER()")
        case se: SubqueryExpression => rejectLateBound(se.plan)
        case _ => ()
      })
    }
    rejectLateBound(parsed)

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
          if (!shadowed && qualify(r.multipartIdentifier) == target) {
            // A CTE named like the ROLE VIEW would capture the substituted
            // single-part name (CTESubstitution binds CTEs before temp
            // views) — silently wrong results, so refuse.
            if (scope(replacement.toLowerCase))
              throw deny(s"a CTE named '$replacement' conflicts with the " +
                "role view runAs substitutes; rename the CTE")
            r.copy(multipartIdentifier = Seq(replacement))
          } else r
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
    val rewritten = rewrite(parsed, Set.empty)

    // Analyze BEFORE constructing the Dataset. The statement rejection
    // above keeps everything below side-effect-free, and the backstop
    // verdict lands before any Dataset exists. No session conf is
    // touched: path reads are denied structurally (parse check above +
    // the no-catalog-identity rule in reaches() below), so concurrent
    // runAs calls — and unrelated concurrent queries — cannot race a
    // set/restore window.
    val analyzed = session.sessionState.executePlan(rewritten).analyzed

    // Post-analysis backstop (defense in depth): the parse-level rewrite
    // only sees names written IN the query text. A pre-existing view whose
    // BODY references the protected table expands during analysis — after
    // the rewrite — and would reach the base relation unsecured. Walk the
    // ANALYZED plan and refuse to return it if the protected table is
    // reachable through any path other than the role view itself.
    //
    // The sanctioned path is identified STRUCTURALLY, not by name: anyone
    // can alias an arbitrary relation as the (predictable) role-view name,
    // but cannot make an arbitrary plan canonicalize to the role view's
    // analyzed body — and a subtree that DOES canonicalize to it computes
    // exactly the secured result, so skipping it can leak nothing.
    val sanctioned: Option[LogicalPlan] =
      try Some(spark.table(replacement)
        .queryExecution.analyzed.canonicalized)
      catch { case _: AnalysisException => None }

    def matchesTarget(ct: org.apache.spark.sql.catalyst.catalog.CatalogTable): Boolean = {
      val id = ct.identifier
      // V1/Hive identifiers carry a single-level database; qualify() shapes
      // the target the same way, so a multi-part current namespace simply
      // never matches a V1 table (it cannot host one).
      val parts = (Seq(id.catalog.getOrElse(currentCatalog)) ++
        id.database.map(Seq(_)).getOrElse(currentNamespace) ++
        Seq(id.table)).map(_.toLowerCase)
      parts == target
    }
    def reaches(plan: LogicalPlan): Boolean =
      if (sanctioned.contains(plan.canonicalized)) false
      else plan match {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          // No catalogTable ⇒ a path-backed read (spark.read.parquet(...)
          // behind a temp view, or SELECT-on-files): nothing attributes it
          // to a catalog entity, so the protected table's own files could
          // hide behind it. Under runAs only catalog-resident relations
          // are permitted — deny, whatever path it reads.
          r.catalogTable.forall(matchesTarget)
        case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
          matchesTarget(h.tableMeta)
        case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          // Same rule for DSv2: an identifier-less relation is a path load.
          v2.identifier.forall { ident =>
            val parts = (Seq(v2.catalog.map(_.name).getOrElse(currentCatalog)) ++
              ident.namespace.toSeq ++ Seq(ident.name)).map(_.toLowerCase)
            parts == target
          }
        case other =>
          other.children.exists(reaches) || other.expressions.exists(_.exists {
            case se: SubqueryExpression => reaches(se.plan)
            case _ => false
          })
      }
    if (reaches(analyzed)) {
      throw deny(
        s"query reaches protected table '$table' through a path the " +
          "substitution does not secure (e.g. a view over it, or a " +
          "path-backed relation with no catalog identity); access " +
          "denied")
    }
    // Return the AUDITED plan, not the parsed one: ofRows(spark,
    // rewritten) would re-analyze, and session changes (temp views,
    // current database) between verdict and execution could rebind a
    // relation the backstop never saw.
    ofRows(spark, analyzed)
  }

  /** Datasource tokens Spark's SELECT-on-files rule accepts as
    * `format.\`path\``; used to reject format-shaped relations under
    * runAs at parse time (dotted class-name heads are rejected
    * separately). */
  private val FileFormatTokens: Set[String] = Set(
    "parquet", "orc", "json", "csv", "text", "avro", "binaryfile",
    "libsvm", "xml", "jdbc", "delta", "iceberg", "hudi", "textfile")

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
