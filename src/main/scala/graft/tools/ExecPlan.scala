package graft.tools
import org.apache.spark.sql.SparkSession
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.toRdd.count() // finalize AQE, no driver rows
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
