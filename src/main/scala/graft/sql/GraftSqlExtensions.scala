package graft.sql

import org.apache.spark.sql.SparkSessionExtensions

/** The engine's builder-time session extension — the one hook that
  * cannot be pure conf, because analyzer rule sets are fixed at session
  * construction (the same reason Delta Lake ships
  * `DeltaSparkSessionExtension`). Install with either:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
  *   // or .withExtensions(new GraftSqlExtensions)
  * }}}
  *
  * What it adds: SQL `MERGE INTO` / `UPDATE` on lake-catalog tables
  * ([[graft.lake.LakeDml]] — routed through the same OCC manifest
  * commits as the API mutators), metadata-only aggregates over lake
  * tables ([[graft.lake.MetadataAggregate]] — COUNT/MIN/MAX/partition
  * GROUP BY answered from the manifest with zero file opens),
  * `OPTIMIZE t` / `VACUUM t RETAIN n VERSIONS` maintenance statements
  * ([[GraftSqlParser]]), and the engine's native SQL functions
  * (`vec_dot`/`vec_cosine`/`vec_qdot`).
  * Everything else about the lake catalog
  * ([[graft.lake.LakeCatalog.install]]) stays runtime conf and needs
  * no extension.
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(_ => graft.lake.LakeDml)
    e.injectOptimizerRule(_ => graft.lake.MetadataAggregate)
    // AFTER MetadataAggregate: a metadata-answerable COUNT over a
    // dv-carrying table should still answer from the manifest (dv
    // counts subtracted there) before DvApply materializes a scan
    e.injectOptimizerRule(_ => graft.lake.DvApply)
    e.injectParser((session, delegate) =>
      new GraftSqlParser(session, delegate))
    new graft.functions.GraftFunctions.Installer()(e)
  }
}
