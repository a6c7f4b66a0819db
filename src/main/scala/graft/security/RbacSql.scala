package graft.security

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StringType

/** The SQL spelling of the RBAC permission plane (round-16 verdict
  * item 6) — the reference declares its grants as statements
  * (`lakeformation grant-permissions`,
  * rbac-demo/setup_rbac_permissions.sh:100-147); here the same
  * declarations are SQL over the existing [[Rbac.Grants]] machinery:
  *
  *   GRANT SELECT [(col, …)] ON <table> TO ROLE <name>
  *       [MASK (col, …)] [WHERE <row filter>]
  *   REVOKE ALL ON <table> FROM ROLE <name>
  *   SHOW GRANTS ON <table>
  *
  * A grant persists in the protected table's catalog metadata — or,
  * for a lake-catalog binding, in the storage root's `_grants/`
  * registry, since the V1 catalog has no entry for a DSv2 binding
  * (durable across sessions either way; a fresh session re-registers
  * its binding and [[Rbac.Grants.restoreViews]] rebuilds enforcement)
  * — and (re)creates the role's secured view, so the
  * comprehensive-rbac scenario — identical query, different results by
  * role — runs from statements alone. Validation is at DECLARATION:
  * unknown columns and unparseable filters refuse here, not at some
  * later query. The statements are mutations of the permission plane,
  * so [[org.apache.spark.sql.graft.SqlRewrite]] refuses them under
  * `runAs` like every non-query (a role must not rewrite its own
  * grants). */
final case class GrantRoleCommand(
    table: String, roleName: String, columns: Option[Seq[String]],
    masked: Seq[String], rowFilter: Option[String])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    require(roleName.matches("[A-Za-z0-9_]+"),
      s"GRANT: role name '$roleName' — use [A-Za-z0-9_]+")
    val tableCols = spark.table(table).columns.toSeq
    def known(what: String, cs: Seq[String]): Unit = cs.foreach(c =>
      require(tableCols.exists(_.equalsIgnoreCase(c)),
        s"GRANT on $table: $what column '$c' is not in the table " +
          s"(columns: ${tableCols.mkString(", ")})"))
    known("granted", columns.getOrElse(Nil))
    known("masked", masked)
    // a masked column must be readable by the role, or the mask is dead
    columns.foreach(cs => masked.foreach(m =>
      require(cs.exists(_.equalsIgnoreCase(m)),
        s"GRANT on $table: masked column '$m' is not in the granted " +
          "column list")))
    rowFilter.foreach { f =>
      val parsed =
        try spark.sessionState.sqlParser.parseExpression(f)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"GRANT on $table: WHERE filter does not parse: $f " +
              s"(${e.getMessage})")
        }
      parsed.references.foreach(a =>
        require(tableCols.exists(_.equalsIgnoreCase(a.name)),
          s"GRANT on $table: WHERE filter references unknown column " +
            s"'${a.name}'"))
    }
    val role = Rbac.Role(roleName, rowFilter, columns, masked)
    Rbac.Grants.grant(spark, table, role)
    Seq(Row(Rbac.viewName(table, role)))
  }
}

/** `REVOKE ALL ON t FROM ROLE r` — removes the durable grant and drops
  * the role's secured view; an un-granted role's queries fail loudly
  * (no view to resolve), restoring the pre-grant world. */
final case class RevokeRoleCommand(table: String, roleName: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("revoked", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    Rbac.Grants.revoke(spark, table, roleName)
    Seq(Row(roleName))
  }
}

/** `SHOW GRANTS ON t` — the durable permission plane, one row per
  * granted role, rebuilt from catalog metadata (the same rows a fresh
  * session would enforce). */
final case class ShowGrantsCommand(table: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("role", StringType, nullable = false)(),
    AttributeReference("columns", StringType, nullable = false)(),
    AttributeReference("masked", StringType, nullable = false)(),
    AttributeReference("row_filter", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] =
    Rbac.Grants.list(spark, table).map { r =>
      Row(r.name, r.allowedColumns.map(_.mkString(",")).getOrElse("*"),
        r.maskedColumns.mkString(","), r.rowFilter.orNull)
    }
}
