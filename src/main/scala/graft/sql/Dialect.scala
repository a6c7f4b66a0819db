package graft.sql

/** Presto/Athena -> Spark SQL dialect shims for the reference's (small,
  * closed) query set (SURVEY §2a Q10/Q17).
  *
  * - `date_format(ts, '%Y-%m-%d')` uses MySQL-style patterns in Presto
  *   (README.md:97); Spark takes Java patterns.
  * - Presto quotes identifiers with double quotes
  *   (comprehensive_rbac_demo.py:116); Spark uses backticks.
  * - `cardinality(items)` needs no shim — Spark ships the alias.
  */
object Dialect {
  private val patternMap = Seq(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%i" -> "mm", "%s" -> "ss")

  /** Translate the %-style pattern inside date_format literals. */
  private def translateDateFormats(sql: String): String =
    "'[^']*%[YmdHis][^']*'".r.replaceAllIn(sql, m =>
      patternMap.foldLeft(m.matched) { case (s, (from, to)) =>
        s.replace(from, to)
      })

  /** Double-quoted identifiers -> backticks (leaves single-quoted string
    * literals untouched). */
  private def translateQuotedIdents(sql: String): String =
    "\"([A-Za-z_][A-Za-z0-9_]*)\"".r.replaceAllIn(sql, m => s"`${m.group(1)}`")

  def translate(sql: String): String =
    translateQuotedIdents(translateDateFormats(sql))
}
