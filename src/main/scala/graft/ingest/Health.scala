package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Alarm/SLO evaluation over the ingestion plane — the CloudWatch alarm
  * block of the reference (option_a_cdk_py/option_a/stack.py:322-351),
  * re-expressed as an assertable health report:
  *
  *  - `dlq-depth`: any message sitting in the DLQ (quarantine) fires —
  *    the reference alarms on ApproximateNumberOfMessagesVisible >= 1;
  *  - `dlq-age`: the oldest quarantined item older than 300 s fires —
  *    the reference alarms on ApproximateAgeOfOldestMessage > 300;
  *  - `error-rate`: >= 1 worker failure in the 5-minute evaluation window
  *    fires — the reference alarms on Errors >= 1 over period 300 s.
  *
  * Evaluation is driver-side over tiny state (accumulator totals + a
  * quarantine directory listing) — no Spark job, O(DLQ files) I/O.
  */
object Health {
  final case class Alarm(
      name: String,
      description: String,
      observed: Double,
      threshold: Double,
      firing: Boolean)

  final case class HealthReport(alarms: Seq[Alarm]) {
    def firing: Seq[Alarm] = alarms.filter(_.firing)
    def healthy: Boolean = firing.isEmpty
    def render: String = alarms.map { a =>
      val state = if (a.firing) "ALARM" else "OK"
      f"[$state%-5s] ${a.name}%-11s observed=${a.observed}%.0f threshold=${a.threshold}%.0f ${a.description}"
    }.mkString("\n")
  }

  val DlqAgeThresholdMs: Long = 300000L // stack.py:339 (300 s)
  val ErrorWindowMs: Long = 300000L // stack.py:330 (period 5 min)

  /** Evaluate the three reference alarms for one ingestion run.
    *
    * @param stats accumulator totals from [[RawWriter.write]]
    * @param nowMs evaluation instant (injectable for deterministic tests)
    */
  def evaluate(
      spark: SparkSession,
      quarantineRoot: String,
      stats: IngestStats,
      nowMs: Long = System.currentTimeMillis()): HealthReport = {
    val (depth, oldestMtime) = dlqState(spark, quarantineRoot)
    val ageMs = oldestMtime.map(m => (nowMs - m).max(0L)).getOrElse(0L)
    HealthReport(Seq(
      Alarm("dlq-depth", "messages in DLQ",
        depth.toDouble, 1.0, depth >= 1),
      Alarm("dlq-age", "age of oldest DLQ message (ms)",
        ageMs.toDouble, DlqAgeThresholdMs.toDouble, ageMs > DlqAgeThresholdMs),
      Alarm("error-rate", "worker failures in 5-min window",
        stats.failed.toDouble, 1.0, stats.failed >= 1)))
  }

  /** (quarantined item count, oldest quarantine file mtime). */
  private def dlqState(
      spark: SparkSession, quarantineRoot: String): (Long, Option[Long]) = {
    val p = new Path(quarantineRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0L, None)
    val files = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("failed-"))
    var depth = 0L
    files.foreach { s =>
      val in = fs.open(s.getPath)
      try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        depth += src.getLines().count(_.nonEmpty)
      } finally in.close()
    }
    (depth, files.map(_.getModificationTime).sorted.headOption)
  }
}
