package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.lake.{ChangeFeed, SnapshotTable}

/** [[graft.lake.ChangeFeed]] as a Structured Streaming SOURCE — the
  * Spark-native way to FOLLOW a governed [[graft.lake.SnapshotTable]]:
  *
  * {{{
  *   spark.readStream
  *     .format("graft-changes")            // or classOf[...].getName
  *     .option("root", tableRoot)
  *     .option("startingVersion", "1")     // | "latest"
  *     .load()                             // table cols + _change_type
  *     .writeStream ...                    //            + _commit_version
  * }}}
  *
  * Offsets ARE snapshot versions: the source's offset for a batch is
  * the highest committed version, and a micro-batch (start, end]
  * serves exactly `ChangeFeed.between(root, start, end)` — so the
  * checkpoint's replay contract is the manifest log's own version
  * arithmetic, nothing bespoke. A restarted stream resumes from the
  * checkpointed version; a consumer that fell behind vacuum retention
  * fails loudly through [[ChangeFeed.between]]'s availability check
  * (resync by restarting with a fresh checkpoint + full read) instead
  * of skipping versions silently.
  *
  * `startingVersion`:
  *   - `"1"` (default): the first batch replays the table's retained
  *     history from its bootstrap commit — every live row arrives as
  *     an insert, so a downstream materialization starts complete;
  *   - `"latest"`: changes committed after the stream starts only;
  *   - `"<n>"`: serve changes from version n onward (first batch
  *     begins at n) — for a consumer that already holds state as of
  *     version n-1.
  *
  * Schema is pinned at stream start ([[ChangeFeed.feedSchema]], i.e.
  * the table's current column set + the two change columns — the V1
  * source contract has one schema per run). If the table evolves new
  * columns mid-stream, `getBatch` fails loudly rather than silently
  * dropping the new column from the feed; restart the stream to pick
  * up the widened schema (rows from pre-evolution vintages then carry
  * NULL, the table read contract).
  *
  * This is a V1 source by design: a version step's batch is a
  * DataFrame-shaped diff ([[ChangeFeed]] composes manifest pruning,
  * pinned-schema scans, and `EXCEPT ALL`), and the V1 `Source.getBatch`
  * seam accepts exactly that — a DSv2 `MicroBatchStream` would have to
  * re-implement the parquet reader per partition to say the same
  * thing. FileStreamSource ships on the same seam.
  */
class ChangeFeedSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("root", throw new IllegalArgumentException(
      "graft-changes needs option 'root' = the SnapshotTable root"))

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) = {
    require(schema.isEmpty,
      "graft-changes derives its schema from the table; " +
        "do not pass one")
    val root = rootOf(parameters)
    (s"graft-changes[$root]",
      ChangeFeed.feedSchema(sqlContext.sparkSession, root))
  }

  override def createSource(
      sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val startingVersion = parameters.get("startingVersion") match {
      case None | Some("1") => 1
      case Some("latest") =>
        // resolve ONCE per checkpoint, not once per (re)start: a
        // latest-start that re-resolved on restart would silently skip
        // every version committed while the query was down — pin the
        // resolution in the source's metadata dir (the KafkaSource
        // initial-offset pattern), where it shares the checkpoint's
        // lifecycle
        val p = new org.apache.hadoop.fs.Path(
          metadataPath, "graft-changes-start")
        val fs = p.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) {
          val in = fs.open(p)
          val content =
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .mkString.trim
            finally in.close()
          // validate loudly: a corrupt pin must say what it is and how
          // to recover, not surface as a bare NumberFormatException
          val v = scala.util.Try(content.toInt).getOrElse(
            throw new IllegalStateException(
              s"corrupt graft-changes start pin at $p " +
                s"(content '${content.take(40)}'); delete the " +
                "checkpoint and restart to re-resolve 'latest'"))
          require(v >= 1,
            s"corrupt graft-changes start pin at $p (version $v)")
          v
        } else {
          val v = SnapshotTable.latest(spark, root).getOrElse(0) + 1
          // temp-file + rename so a crash mid-write can never leave a
          // readable-but-partial pin (the KafkaSource initial-offset
          // pattern); rename is atomic on the same filesystem
          val tmp = new org.apache.hadoop.fs.Path(
            metadataPath, s"graft-changes-start.tmp.${System.nanoTime()}")
          val out = fs.create(tmp, false)
          try out.write(v.toString.getBytes("UTF-8"))
          finally out.close()
          if (!fs.rename(tmp, p)) {
            // a concurrent (re)start won the race: read ITS pin so
            // every instance of this checkpoint agrees on one start
            fs.delete(tmp, false)
            val in = fs.open(p)
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .mkString.trim.toInt
            finally in.close()
          } else v
        }
      case Some(v) =>
        val n =
          try v.toInt
          catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"startingVersion must be a version number or " +
                  s"'latest', got '$v'")
          }
        require(n >= 1, s"startingVersion must be >= 1, got $n")
        n
    }
    new ChangeFeedSource(spark, root, startingVersion)
  }
}

/** One running stream over one table root; `startingVersion` is the
  * first version whose changes this stream serves.
  *
  * Implements [[SupportsTriggerAvailableNow]] the way KafkaSource (a
  * V1 source on the same seam) does, so `Trigger.AvailableNow` gets
  * its EXACT contract instead of the engine's single-batch fallback:
  * the drain's end version is pinned once at `prepareForTrigger
  * AvailableNow`, commits landing DURING the drain are left for the
  * next run, and the engine's admission-control path
  * ([[latestOffset]]) serves both AvailableNow and continuous
  * triggers from one code path. */
class ChangeFeedSource(
    spark: SparkSession, root: String, startingVersion: Int)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, Offset => OffsetV2}

  private val pinnedSchema = ChangeFeed.feedSchema(spark, root)

  /** The version the pin was computed AT — what separates a legitimate
    * restart replay (batch range ends at or before this version, so an
    * evolved column can genuinely be absent from the older range) from
    * a mid-stream schema NARROWING (a full-replace write with fewer
    * columns in a range PAST the pin), which must stay a loud failure
    * (round-14 advice item 3). */
  private val pinnedAtVersion: Int =
    SnapshotTable.latest(spark, root).getOrElse(0)

  override def schema: StructType = pinnedSchema

  private def versionOf(o: Offset): Int = (o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }).toInt

  override def getOffset: Option[Offset] =
    SnapshotTable.latest(spark, root) match {
      case Some(v) if v >= startingVersion => Some(LongOffset(v.toLong))
      case _ => None
    }

  // --- admission control (the engine prefers this over getOffset) ---

  /** The version an AvailableNow run drains TO, pinned at prepare
    * time; None outside AvailableNow. */
  private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      Some(SnapshotTable.latest(spark, root).getOrElse(0))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): OffsetV2 =
    LongOffset(startingVersion - 1L)

  /** Null = no new data (the admission-control contract). A commit
    * landing after an AvailableNow prepare is NOT served this run.
    * `start` is null on a fresh checkpoint's first batch (the engine
    * passes the prior committed offset, not [[initialOffset]]). */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val cur = availableNowTarget.getOrElse(
      SnapshotTable.latest(spark, root).getOrElse(0))
    val startV =
      if (start == null) startingVersion - 1L
      else start.json.trim.toLong
    if (cur >= startingVersion && cur > startV) LongOffset(cur.toLong)
    else null
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion - 1)
    val to = versionOf(end)
    val batch = ChangeFeed.between(spark, root, from, to)
    val extra = batch.columns.filterNot(pinnedSchema.fieldNames.contains)
    if (extra.nonEmpty)
      throw new IllegalStateException(
        s"table $root evolved new column(s) ${extra.mkString(", ")} " +
          "mid-stream; restart the stream to pick up the widened schema")
    // Align to the pinned order (between() returns newest-first order
    // already, but the checkpointed run must be byte-stable against the
    // pin). A pinned column MISSING from the batch is legitimate ONLY
    // on restart replay: pinnedSchema is recomputed at the CURRENT
    // latest on source re-creation, but a pending (offset-logged,
    // uncommitted) batch replays an older range — if a schema-evolving
    // commit landed after that range's end, the replayed between()
    // never carries the new column. Padding NULL (exactly how
    // between() aligns older vintages) keeps the restart from
    // crash-looping on a checkpoint that can never contain the column.
    // A range ending PAST the pin version, though, means the live
    // table NARROWED mid-stream (a full-replace write with fewer
    // columns) — that stays a loud failure, not silent nulls
    // (round-14 advice item 3).
    val batchCols = batch.columns.toSet
    val missing = pinnedSchema.fieldNames.filterNot(batchCols)
    if (missing.nonEmpty && to > pinnedAtVersion)
      throw new IllegalStateException(
        s"table $root lost pinned column(s) ${missing.mkString(", ")} " +
          s"in a range (v$from..v$to) past the pin (v$pinnedAtVersion) " +
          "— the table narrowed mid-stream; restart the stream against " +
          "the new schema")
    val aligned = batch.select(pinnedSchema.fields.map { f =>
      if (batchCols(f.name)) org.apache.spark.sql.functions.col(f.name)
      else org.apache.spark.sql.functions.lit(null)
        .cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    Bridge.streamingFrame(aligned)
  }

  override def stop(): Unit = {}
}
