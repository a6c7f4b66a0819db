package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measures shuffle traffic of a code block via a task-end listener —
  * the I11 metrics surface (SURVEY §2b), and the instrument that turns
  * "this operator shuffles less" from a claim into an assertion. */
object ShuffleMeter {
  final case class Shuffle(bytesWritten: Long, recordsWritten: Long)

  def measure[T](spark: SparkSession)(body: => T): (T, Shuffle) = {
    @volatile var bytes = 0L
    @volatile var records = 0L
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          bytes += m.shuffleWriteMetrics.bytesWritten
          records += m.shuffleWriteMetrics.recordsWritten
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val result = body
      org.apache.spark.GraftListenerBridge.waitUntilEmpty(spark.sparkContext)
      (result, Shuffle(bytes, records))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
