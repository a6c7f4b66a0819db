package graft.sql

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL spellings for the lake-table MAINTENANCE/INSPECTION statements
  * that have no Spark-SQL grammar — the same parser-injection seam
  * Delta uses for its `OPTIMIZE`/`VACUUM`/`DESCRIBE HISTORY`:
  *
  *   OPTIMIZE <table>                      → [[graft.lake.SnapshotTable.optimize]]
  *   VACUUM <table> RETAIN <n> VERSIONS    → [[graft.lake.SnapshotTable.vacuum]]
  *   DESCRIBE HISTORY <table>              → [[graft.lake.SnapshotTable.history]]
  *   RESTORE TABLE <table> TO VERSION AS OF <n>
  *                                         → [[graft.lake.SnapshotTable.restore]]
  *   DESCRIBE DETAIL <table>               → [[graft.lake.DescribeDetailCommand]]
  *   SHOW CREATE TABLE <table>             → [[graft.lake.ShowCreateLakeTableCommand]]
  *   ALTER TABLE <t> ADD CONSTRAINT n CHECK (e) / DROP CONSTRAINT n
  *   ALTER TABLE <t> ALTER COLUMN c SET / DROP NOT NULL
  *                                         → [[graft.lake.AlterConstraintCommand]]
  *
  * Only statements matching these exact shapes are intercepted (one
  * anchored, case-insensitive match on the raw text); EVERYTHING else
  * — including malformed OPTIMIZE/VACUUM variants — falls through to
  * Spark's own parser and its own error surface. `RETAIN n VERSIONS`
  * is mandatory for VACUUM: a defaulted retention horizon silently
  * deleting history is the one lakehouse foot-gun this engine refuses
  * to ship (the API requires the same explicit argument).
  */
class GraftSqlParser(
    session: org.apache.spark.sql.SparkSession,
    delegate: ParserInterface) extends ParserInterface {

  private val Optimize =
    """(?is)\s*OPTIMIZE\s+([\w.]+)\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+([\w.]+)\s+RETAIN\s+(\d+)\s+VERSIONS\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.]+)\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val Detail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+([\w.]+)\s*;?\s*""".r
  private val ShowCreate =
    """(?is)\s*SHOW\s+CREATE\s+TABLE\s+([\w.]+)\s*;?\s*""".r
  private val Clone =
    ("""(?is)\s*CREATE\s+TABLE\s+([\w.]+)\s+SHALLOW\s+CLONE\s+""" +
      """([\w.]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*""").r
  // RBAC permission plane (round 17) — Spark SQL has no GRANT grammar,
  // so these shapes are unclaimed; anything not matching falls through
  // to the delegate's own (loud) parse error.
  private val Grant =
    ("""(?is)\s*GRANT\s+SELECT\s*(?:\(([^)]*)\))?\s+ON\s+([\w.]+)\s+""" +
      """TO\s+ROLE\s+(\w+)(?:\s+MASK\s*\(([^)]*)\))?""" +
      """(?:\s+WHERE\s+(.+?))?\s*;?\s*""").r
  private val Revoke =
    """(?is)\s*REVOKE\s+ALL\s+ON\s+([\w.]+)\s+FROM\s+ROLE\s+(\w+)\s*;?\s*""".r
  private val ShowGrants =
    """(?is)\s*SHOW\s+GRANTS\s+ON\s+([\w.]+)\s*;?\s*""".r
  // constraint adoption on existing tables (round 18) — these collide
  // with real Spark ALTER TABLE grammar, so they intercept only when
  // the name resolves as a lake binding (isLakeBinding guard below)
  private val AddConstraint =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+CONSTRAINT\s+(\w+)""" +
      """\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val DropConstraint =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val SetNotNull =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+COLUMN\s+(\w+)""" +
      """\s+SET\s+NOT\s+NULL\s*;?\s*""").r
  private val DropNotNull =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+COLUMN\s+(\w+)""" +
      """\s+DROP\s+NOT\s+NULL\s*;?\s*""").r

  private def csv(s: String): Seq[String] =
    Option(s).toSeq.flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))

  /** `DESCRIBE HISTORY t` is the ONE intercepted shape that collides
    * with real Spark grammar: `DESCRIBE history <column>` describes a
    * column of a table named `history`. Disambiguate by the lake
    * binding namespace — intercept only when the named table actually
    * resolves as a lake binding (and any catalog prefix is a lake
    * catalog); everything else reaches Spark's own DESCRIBE. */
  private def isLakeBinding(t: String): Boolean =
    try {
      val parts = t.split('.')
      parts.length <= 2 &&
        (parts.length == 1 || session.conf
          .getOption(s"spark.sql.catalog.${parts.head}")
          .contains(classOf[graft.lake.LakeCatalog].getName)) &&
        session.conf.getOption(
          graft.lake.LakeCatalog.BindingPrefix + parts.last).isDefined
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Whether a maintenance statement on `t` belongs to THIS engine —
    * the disambiguation that keeps a chained lakehouse extension's
    * (Delta/Iceberg) own `OPTIMIZE`/`VACUUM` statements reaching THEIR
    * parser (round-15 advice item 3) without losing the loud
    * misdirection refusal `LakeDmlSpec` pins:
    *  - a catalog prefix REGISTERED as another implementation is
    *    theirs — fall through to the delegate chain;
    *  - an UNREGISTERED prefix (a typo) or a lake-catalog prefix is
    *    ours — intercept, and let [[graft.lake.LakeCatalog
    *    .resolveBinding]] refuse or resolve loudly;
    *  - a bare name is ours only when a lake binding of that name
    *    exists (Delta's `OPTIMIZE tbl` on a spark_catalog table must
    *    not be swallowed). */
  private def isOurMaintenance(t: String): Boolean =
    try {
      val parts = t.split('.')
      if (parts.length > 2) false
      else if (parts.length == 2)
        session.conf.getOption(s"spark.sql.catalog.${parts.head}")
          .forall(_ == classOf[graft.lake.LakeCatalog].getName)
      else session.conf.getOption(
        graft.lake.LakeCatalog.BindingPrefix + parts.last).isDefined
    } catch { case scala.util.control.NonFatal(_) => false }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Optimize(t) if isOurMaintenance(t) =>
      graft.lake.OptimizeLakeTableCommand(t)
    case Vacuum(t, n) if isOurMaintenance(t) =>
      graft.lake.VacuumLakeTableCommand(t, n.toInt)
    case History(t) if isLakeBinding(t) =>
      graft.lake.DescribeHistoryCommand(t)
    case Restore(t, v) if isOurMaintenance(t) =>
      graft.lake.RestoreLakeTableCommand(t, v.toInt)
    // like DESCRIBE HISTORY, these two collide with real Spark grammar
    // (`DESCRIBE detail <col>`; SHOW CREATE TABLE on any catalog), so
    // they intercept ONLY when the name resolves as a lake binding —
    // every other table keeps Spark's own statements
    case Detail(t) if isLakeBinding(t) =>
      graft.lake.DescribeDetailCommand(t)
    case ShowCreate(t) if isLakeBinding(t) =>
      graft.lake.ShowCreateLakeTableCommand(t)
    case Clone(target, src, v, loc) if isOurMaintenance(src) =>
      graft.lake.ShallowCloneCommand(target, src,
        Option(v).map(_.toInt), Option(loc))
    case AddConstraint(t, nm, cond) if isLakeBinding(t) =>
      graft.lake.AlterConstraintCommand(t,
        graft.lake.AlterConstraintCommand.AddCheck(nm, cond.trim))
    case DropConstraint(t, nm) if isLakeBinding(t) =>
      graft.lake.AlterConstraintCommand(t,
        graft.lake.AlterConstraintCommand.DropCheck(nm))
    case SetNotNull(t, c) if isLakeBinding(t) =>
      graft.lake.AlterConstraintCommand(t,
        graft.lake.AlterConstraintCommand.SetNotNull(c))
    case DropNotNull(t, c) if isLakeBinding(t) =>
      graft.lake.AlterConstraintCommand(t,
        graft.lake.AlterConstraintCommand.DropNotNull(c))
    case Grant(cols, t, role, mask, filter) =>
      graft.security.GrantRoleCommand(t, role,
        Option(cols).map(csv).filter(_.nonEmpty),
        csv(mask), Option(filter).map(_.trim).filter(_.nonEmpty))
    case Revoke(t, role) =>
      graft.security.RevokeRoleCommand(t, role)
    case ShowGrants(t) =>
      graft.security.ShowGrantsCommand(t)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}
