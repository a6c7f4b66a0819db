package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling harness for the persisted-index BUILD paths (round 20):
  * stage timers for the dedup index build — signature pass vs the
  * 64-directory dynamic-partition write — plus A/B of write layouts.
  * Throwaway diagnostics.
  * Usage: runMain graft.tools.IdxProf <sfDir> [reps]
  */
object IdxProf {
  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

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
    val scratch = "/tmp/graft_idxprof"

    if (sys.env.get("IDXPROF_COLD").contains("1")) {
      // bench-shaped: table warmup + range sum, then ONE cold build,
      // stage-split — what the bench's index_build.dedup actually times
      graft.core.Tables.names.foreach(t =>
        graft.core.Tables(spark, dir, t).count())
      spark.range(1000000L).selectExpr("sum(id)").collect()
      val banded = graft.queries.Dedup.bandedWithSig(spark, dir)
        .withColumn("pfx", substring(col("bh"), 1, 1))
      val tPipe = time { banded.write.format("noop").mode("overwrite").save() }
      val root = s"$scratch/cold"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val tWrite = time {
        banded.repartition(64, col("band"), col("pfx"))
          .write.mode("overwrite").partitionBy("band", "pfx")
          .parquet(s"$root/bands")
      }
      println(f"[idxprof] cold pipe=$tPipe%.2fs write=$tWrite%.2fs")
      spark.stop(); return
    }

    // whole-build timing via the real entry point, cold per rep
    (1 to reps).foreach { i =>
      val root = s"$scratch/dedup_$i"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val t = time {
        graft.operators.DedupIndex.buildIfMissing(spark, dir, root) }
      spark.catalog.clearCache()
      println(f"[idxprof] full_build#$i: $t%.2fs")
    }

    // stage split: banded pipeline alone (noop-style count) vs write
    (1 to reps).foreach { i =>
      val banded = graft.queries.Dedup.bandedWithSig(spark, dir)
        .withColumn("pfx", substring(col("bh"), 1, 1))
      val tPipe = time { banded.write.format("noop").mode("overwrite").save() }
      val root = s"$scratch/w_current_$i"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val tWrite = time {
        banded.repartition(64, col("band"), col("pfx"))
          .write.mode("overwrite").partitionBy("band", "pfx")
          .parquet(s"$root/bands")
      }
      spark.catalog.clearCache()
      println(f"[idxprof] pipe#$i: $tPipe%.2fs write_current#$i: $tWrite%.2fs")
    }

    // write-layout A/B over a PRE-MATERIALIZED banded frame (isolates
    // the write): current repartition(64, keys) vs sortWithinPartitions
    // vs repartition by keys (AQE-sized)
    val mat = graft.queries.Dedup.bandedWithSig(spark, dir)
      .withColumn("pfx", substring(col("bh"), 1, 1))
      .localCheckpoint(true)
    (1 to reps).foreach { i =>
      def w(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        val root = s"$scratch/w_${tag}_$i"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
        val t = time {
          df.write.mode("overwrite").partitionBy("band", "pfx")
            .parquet(s"$root/bands") }
        println(f"[idxprof] layout_$tag#$i: $t%.2fs")
      }
      w("repart64")(mat.repartition(64, col("band"), col("pfx")))
      w("repartKeys")(mat.repartition(col("band"), col("pfx")))
      w("sortWithin")(mat.repartition(64, col("band"), col("pfx"))
        .sortWithinPartitions(col("band"), col("pfx")))
      w("plain")(mat)
    }
    spark.stop()
  }
}
