package graft.tools

import org.apache.spark.sql.SparkSession

/** Profiling harness for the t51 change-feed path (round 20): times
  * the full between(0,2) replay and each single step, so the regressed
  * stage is named instead of argued. Throwaway diagnostics.
  * Usage: runMain graft.tools.FeedProf <sfDir> [reps]
  */
object FeedProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val root = graft.queries.Corpus.cdcRootForProf(spark, dir)
    def t(tag: String)(b: => Long): Unit = {
      val t0 = System.nanoTime(); val n = b
      println(f"[feedprof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    graft.lake.ChangeFeed.between(spark, root, 0, 2).count() // warm
    (1 to reps).foreach { i =>
      t(s"full(0,2)#$i") {
        graft.lake.ChangeFeed.between(spark, root, 0, 2).count() }
      t(s"step1(0,1)#$i") {
        graft.lake.ChangeFeed.between(spark, root, 0, 1).count() }
      t(s"step2(1,2)#$i") {
        graft.lake.ChangeFeed.between(spark, root, 1, 2).count() }
      t(s"t51#$i") {
        graft.SparkEntry.queries("t51_change_feed")(spark, dir).count() }
    }
    spark.stop()
  }
}
