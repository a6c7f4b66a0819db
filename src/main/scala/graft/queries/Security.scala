package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.security.Rbac

/** Oracle-gated RBAC (round-10 verdict item 6): the reference's
  * defining behavior — the IDENTICAL query returning role-divergent
  * results (comprehensive_rbac_demo.py:109-216) — carried by the same
  * external DuckDB gate as every other operator, not only by
  * ScalaTest. The loud-failure half of the contract (a denied column
  * reference throws at analysis) cannot be oracle-expressed and stays
  * pinned in `LlmRbacSpec` / `IngestSpec`. */
object Security {

  /** One per-source corpus rollup, with the role baked into the output
    * so three runs of the SAME aggregation union into one gated frame:
    *  - `unrestricted`: the full corpus;
    *  - `doc_curator`: row security — [[Rbac.docCurator]]'s licensed-
    *    source filter applies at [[Tables]] load, so the rollup sees a
    *    different world (fewer sources, fewer rows), and because the
    *    filter is a plain Catalyst predicate it pushes into the scan
    *    (partition pruning at 100 TB — governance costs nothing);
    *  - `doc_meta`: column security — the role may measure the corpus
    *    (source, n_chars are granted) but never read `text`; this leg
    *    proves the granted-column path yields exactly the full
    *    numbers, while LlmRbacSpec pins that touching `text` throws.
    * The query inside each role binding is UNCHANGED — that is the
    * contract being gated. */
  private def roleRollup(
      spark: SparkSession, dir: String, roleTag: String): DataFrame =
    Tables(spark, dir, "documents")
      .transform(Tables.fanOut)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("role", lit(roleTag))
      .select(col("role"), col("source"), col("n_docs"), col("total_chars"))

  private[queries] def rbacRoles(
      spark: SparkSession, dir: String): DataFrame = {
    val unrestricted = roleRollup(spark, dir, "unrestricted")
    val curator = Rbac.asRole(spark, "documents" -> Rbac.docCurator) {
      roleRollup(spark, dir, "doc_curator")
    }
    val meta = Rbac.asRole(spark, "documents" -> Rbac.docMeta) {
      roleRollup(spark, dir, "doc_meta")
    }
    unrestricted.unionByName(curator).unionByName(meta)
      .orderBy(col("role"), col("source"))
  }

  val q63_rbac_roles = Q(
    "q63_rbac_roles",
    (s, dir) => rbacRoles(s, dir),
    Some("""
      WITH full_r AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source),
      cur AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents WHERE source NOT LIKE 'src1%' GROUP BY source)
      SELECT 'unrestricted' AS role, * FROM full_r
      UNION ALL SELECT 'doc_curator' AS role, * FROM cur
      UNION ALL SELECT 'doc_meta' AS role, * FROM full_r
      ORDER BY role, source"""))

  val all: Seq[Q] = Seq(q63_rbac_roles)
}
