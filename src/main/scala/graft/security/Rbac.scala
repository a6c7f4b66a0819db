package graft.security

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Role-based row/column security producing different results for the
  * same query — the Lake Formation plane of the reference
  * (rbac-demo/README.md:119-149, stack.py:209-320).
  *
  * Enforcement is view-based, which reproduces both observable behaviors
  * exactly at analysis time:
  *  - row security filters silently (core sees only endpoint='api-a');
  *  - column security fails loudly (referencing `items` via the core view
  *    throws AnalysisException, matching "query fails" semantics of
  *    comprehensive_rbac_demo.py:191-200).
  * Catalyst pushes the view's filter into the scan, so the row filter also
  * prunes partitions on `source` — governance costs nothing at scale.
  */
object Rbac {
  final case class Role(
      name: String,
      rowFilter: Option[String],
      allowedColumns: Option[Seq[String]],
      maskedColumns: Seq[String] = Nil)

  /** The reference's two demo roles (rbac-demo/README.md:126-149). */
  val core: Role = Role("core", Some("endpoint = 'api-a'"),
    Some(Seq("endpoint", "date", "page", "fetched_at", "source", "ingestion_date")))
  val pii: Role = Role("pii", None, None)

  /** A masking role: sees every row, but sensitive columns are replaced
    * by their digest — the LF "mask" alternative to hard denial (queries
    * referencing the column succeed but see no cleartext). */
  val masked: Role = Role("masked", None, None,
    maskedColumns = Seq("fetched_at"))

  def viewName(table: String, role: Role): String =
    s"${table.replace('.', '_')}_${role.name}"

  /** Create one secured view per role over `table`. */
  def createRoleViews(
      spark: SparkSession, table: String, roles: Seq[Role] = Seq(core, pii)): Unit =
    roles.foreach { r =>
      val allCols = r.allowedColumns
        .getOrElse(spark.table(table).columns.toSeq)
      val cols = allCols.map {
        case c if r.maskedColumns.contains(c) => s"md5(CAST(`$c` AS STRING)) AS `$c`"
        case c => s"`$c`"
      }.mkString(", ")
      val where = r.rowFilter.map(f => s" WHERE $f").getOrElse("")
      spark.sql(
        s"""CREATE OR REPLACE TEMPORARY VIEW ${viewName(table, r)}
            AS SELECT $cols FROM $table$where""")
    }

  /** Run a query as a role: occurrences of the base table name resolve to
    * the role's secured view (the Athena+LF entry point, E1 in SURVEY §3).
    * Unauthorized column references fail during analysis, identical to the
    * reference's failed-query behavior. */
  def runAs(
      spark: SparkSession, role: Role, table: String, sql: String): DataFrame =
    spark.sql(sql.replace(table, viewName(table, role)))
}
