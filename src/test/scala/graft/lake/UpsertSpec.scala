package graft.lake

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-pruned upsert/delete: correctness of the merge, proof that
  * untouched partitions are not rewritten (their files stay
  * byte-for-byte in place), and crash-window recovery. */
class UpsertSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def freshDataset(): String = {
    val root = tmpDir("upsert-ds")
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
        col("source"))
      .repartition(4, col("source"))
      .write.mode("overwrite").partitionBy("source").parquet(root)
    root
  }

  private def listing(root: String): Map[String, Set[(String, Long)]] = {
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("source="))
    dirs.map { d =>
      d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }.toMap
  }

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select(col("doc_id"), col("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("upsert replaces matched keys, inserts new ones, in one batch") {
    val root = freshDataset()
    val updates = spark.createDataFrame(Seq(
      (3L, "replaced three", "en", 14L, "src3"),
      (7L, "replaced seven", "en", 14L, "src7"),
      (100003L, "brand new", "en", 9L, "src3")))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    val touched = Lake.upsert(spark, root, updates, "doc_id", "source")
    assert(touched == 2, s"expected 2 touched partitions, got $touched")
    val after = spark.read.parquet(root)
    assert(rows(after.filter(col("doc_id").isin(3L, 7L, 100003L))) ==
      Set((3L, "replaced three", 14L), (7L, "replaced seven", 14L),
        (100003L, "brand new", 9L)))
    // total rows: one net insert
    val before = Tables(spark, sfDir, "documents").count()
    assert(after.count() == before + 1)
  }

  test("untouched partitions are not rewritten — files stay in place") {
    val root = freshDataset()
    val before = listing(root)
    val updates = spark.createDataFrame(Seq(
      (3L, "replaced", "en", 8L, "src3")))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    Lake.upsert(spark, root, updates, "doc_id", "source")
    val after = listing(root)
    val untouchedBefore = before - "source=src3"
    val untouchedAfter = after - "source=src3"
    assert(untouchedAfter == untouchedBefore,
      "an untouched partition's files changed — pruning is broken")
    assert(after("source=src3") != before("source=src3"))
  }

  test("deleteWhere rewrites only partitions containing matches") {
    val root = freshDataset()
    val before = listing(root)
    val n0 = spark.read.parquet(root).count()
    val victims = spark.read.parquet(root)
      .filter(col("source") === "src5" && col("doc_id") % 3 === 0).count()
    assert(victims > 0, "no rows match at smoke scale; weak test")
    val touched = Lake.deleteWhere(spark, root,
      col("source") === "src5" && col("doc_id") % 3 === 0, "source")
    assert(touched == 1)
    val after = spark.read.parquet(root)
    assert(after.count() == n0 - victims)
    assert(after.filter(col("source") === "src5" && col("doc_id") % 3 === 0)
      .isEmpty)
    assert((listing(root) - "source=src5") == (before - "source=src5"))
  }

  test("filesPerPartition parallelizes a hot-partition rewrite") {
    // Round-8 verdict #3: a CDC batch touching ONE hot partition used to
    // rewrite that directory through a single task (one file). With the
    // salt threaded through, the same merge fans out across up to
    // `filesPerPartition` writer tasks — >1 file proves >1 task wrote
    // the directory — and the merged rows are identical either way.
    val rootSalted = freshDataset()
    val rootSerial = freshDataset()
    val updates = spark.createDataFrame(Seq(
      (3L, "replaced three", "en", 14L, "src3"),
      (100003L, "brand new", "en", 9L, "src3")))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    Lake.upsert(spark, rootSalted, updates, "doc_id", "source",
      filesPerPartition = 4)
    Lake.upsert(spark, rootSerial, updates, "doc_id", "source")
    val saltedFiles = listing(rootSalted)("source=src3").size
    assert(saltedFiles > 1,
      s"hot partition still wrote $saltedFiles file(s) — rewrite is serial")
    assert(listing(rootSerial)("source=src3").size == 1)
    assert(rows(spark.read.parquet(rootSalted)) ==
      rows(spark.read.parquet(rootSerial)),
      "salted rewrite changed the merge result")
  }

  test("property: random upsert/delete sequences match a map model") {
    import org.scalacheck.Gen
    val rowGen = for {
      k <- Gen.choose(0L, 30L)
      v <- Gen.alphaLowerStr.map(_.take(6))
    } yield (k, v, "en", v.length.toLong, s"src${k % 4}")
    val batchGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, rowGen))
    (0 until 3).foreach { seed =>
      val root = tmpDir(s"upsert-prop-$seed")
      val base = batchGen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed * 10L)).get
        .distinctBy(_._1) // unique keys in the base dataset
      spark.createDataFrame(base)
        .toDF("doc_id", "text", "lang", "n_chars", "source")
        .write.mode("overwrite").partitionBy("source").parquet(root)
      var model: Map[Long, (Long, String)] =
        base.map(r => r._1 -> (r._1, r._2)).toMap
      (1 to 3).foreach { b =>
        val batch = batchGen(Gen.Parameters.default,
          Seed(seed * 10L + b)).get.distinctBy(_._1)
        Lake.upsert(spark,
          root,
          spark.createDataFrame(batch)
            .toDF("doc_id", "text", "lang", "n_chars", "source"),
          "doc_id", "source")
        model = model ++ batch.map(r => r._1 -> (r._1, r._2)).toMap
      }
      val got = spark.read.parquet(root)
        .select(col("doc_id"), col("text")).collect()
        .map(r => r.getLong(0) -> (r.getLong(0), r.getString(1))).toMap
      assert(got == model, s"seed=$seed: dataset diverged from the model")
    }
  }

  private def Seed(l: Long) = org.scalacheck.rng.Seed(l)

  test("upsert finds partitions whose values need Hive path-escaping") {
    // Spark writes source="a:b" as source=a%3Ab; a raw "$col=$v" dir
    // name misses it and the swap silently discards the merged data
    val root = tmpDir("upsert-escape")
    spark.createDataFrame(Seq(
      (1L, "one", "en", 3L, "a:b"), (2L, "two", "en", 3L, "plain")))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
      .write.mode("overwrite").partitionBy("source").parquet(root)
    val updates = spark.createDataFrame(Seq(
      (1L, "one v2", "en", 6L, "a:b")))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    assert(Lake.upsert(spark, root, updates, "doc_id", "source") == 1)
    val got = spark.read.parquet(root).filter(col("doc_id") === 1L)
      .select("text").collect().map(_.getString(0)).toSeq
    assert(got == Seq("one v2"),
      s"escaped-partition update was lost: $got")
  }

  test("deleteWhere keeps rows where the predicate is NULL") {
    val root = tmpDir("delete-null")
    spark.createDataFrame(Seq(
      (1L, Some("en"), "src0"), (2L, None: Option[String], "src0"),
      (3L, Some("de"), "src0")))
      .toDF("doc_id", "lang", "source")
      .write.mode("overwrite").partitionBy("source").parquet(root)
    Lake.deleteWhere(spark, root, col("lang") === "en", "source")
    val left = spark.read.parquet(root)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 2 (lang NULL) never matched the predicate — it must survive
    assert(left == Set(2L, 3L),
      s"NULL-predicate rows were silently deleted: kept $left")
  }

  test("a duplicate-key update batch is rejected loudly") {
    val root = freshDataset()
    val dup = spark.createDataFrame(Seq(
      (3L, "v1", "en", 2L, "src3"), (3L, "v2", "en", 2L, "src3")))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    val e = intercept[IllegalArgumentException] {
      Lake.upsert(spark, root, dup, "doc_id", "source")
    }
    assert(e.getMessage.contains("duplicate-key"))
  }

  test("upsert works on a timestamp-partitioned dataset (rendered paths)") {
    // java.sql.Timestamp.toString is '... 00:00:00.0' while Spark
    // writes 'ts=2026-01-01 00%3A00%3A00' — the dir name must come from
    // Spark's own cast-to-string rendering or the swap misses (and then
    // destroys) the partition
    val root = tmpDir("upsert-ts")
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
    spark.createDataFrame(Seq((1L, "one", t0), (2L, "two", t1)))
      .toDF("doc_id", "text", "ts")
      .write.mode("overwrite").partitionBy("ts").parquet(root)
    val updates = spark.createDataFrame(Seq((1L, "one v2", t0)))
      .toDF("doc_id", "text", "ts")
    assert(Lake.upsert(spark, root, updates, "doc_id", "ts") == 1)
    val after = spark.read.parquet(root)
    assert(after.count() == 2, "a partition was lost in the swap")
    assert(after.filter(col("doc_id") === 1L).select("text")
      .collect()(0).getString(0) == "one v2")
  }

  test("null-key rows are rejected with the accurate message") {
    val root = freshDataset()
    val nullKey = spark.createDataFrame(Seq(
      (Option.empty[Long], "ghost", "en", 5L, "src3"),
      (Some(4L), "ok", "en", 2L, "src4")))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    val e = intercept[IllegalArgumentException] {
      Lake.upsert(spark, root, nullKey, "doc_id", "source")
    }
    assert(e.getMessage.contains("NULL-key"),
      s"wrong rejection cause: ${e.getMessage}")
  }

  test("an upsert after an unrecovered crash restores state first") {
    // The checkpoint-replay path calls upsert directly, never
    // recoverUpsert — the swap must auto-recover crashed aside state
    // instead of deleting the only copy of a partition
    val root = freshDataset()
    val expected = rows(spark.read.parquet(root))
    val u1 = spark.createDataFrame(Seq((3L, "crashes", "en", 7L, "src3")))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    intercept[java.io.IOException] {
      Lake.upsert(spark, root, u1, "doc_id", "source",
        crashAfterSwapOut = true)
    }
    // no recoverUpsert here — replay applies the same change again
    Lake.upsert(spark, root, u1, "doc_id", "source")
    val after = rows(spark.read.parquet(root))
    val expectedAfter = expected.filterNot(_._1 == 3L) + ((3L, "crashes", 7L))
    assert(after == expectedAfter,
      "replay after a crashed swap lost pre-existing rows")
  }

  test("a crash inside the swap window is recoverable, losing nothing") {
    val root = freshDataset()
    val expected = rows(spark.read.parquet(root))
    val updates = spark.createDataFrame(Seq(
      (3L, "never lands", "en", 11L, "src3")))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    intercept[java.io.IOException] {
      Lake.upsert(spark, root, updates, "doc_id", "source",
        crashAfterSwapOut = true)
    }
    // src3 is now aside; the dataset is missing a partition until
    // recovery puts the old copy back
    val recovered = Lake.recoverUpsert(spark, root, "source")
    assert(recovered == 1, s"expected 1 recovered partition, got $recovered")
    assert(rows(spark.read.parquet(root)) == expected,
      "recovery did not restore the pre-upsert dataset")
  }
}
