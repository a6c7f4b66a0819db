package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print schema + formatted physical plan for a query or a raw
  * parquet path. Used to iterate on plans (pushdown, broadcast, codegen
  * spans) — not part of the driver contract.
  *
  * Usage:
  *   graft.tools.Explain <sfDir> <queryName>   — explain a SparkEntry query
  *   graft.tools.Explain read <parquetPath>    — schema + 3 rows of a file
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args match {
      case Array("read", path) =>
        val df = spark.read.parquet(path)
        df.printSchema()
        df.show(3, truncate = 120)
      case Array(sfDir, name) =>
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.printSchema()
        df.explain("formatted")
      case _ =>
        System.err.println("usage: Explain <sfDir> <query> | Explain read <path>")
    }
    spark.stop()
  }
}
