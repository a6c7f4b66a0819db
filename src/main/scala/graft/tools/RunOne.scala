package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run one SparkEntry query N times and print per-iteration
  * wall times (first = cold, rest = warm). */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name, nStr @ _*) = args
    val n = nStr.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val clear = sys.env.get("RUNONE_CLEAR_CACHE").contains("1")
    for (i <- 1 to n) {
      if (clear) spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"iter $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
    }
    spark.stop()
  }
}
