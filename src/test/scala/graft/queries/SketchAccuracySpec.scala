package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Statistical sanity of the MinHash estimator on documents with KNOWN
  * overlap: est_sim from 16-slot signatures must track true Jaccard
  * within the sketch's error (fixed inputs => fully deterministic). */
class SketchAccuracySpec extends SparkSpec {
  import spark.implicits._

  test("minhash estimate tracks true jaccard on controlled overlaps") {
    // doc pairs built from a shared pool: pair i shares i*10% of shingles
    def doc(shared: Int, unique: Int, tag: String): String =
      ((1 to shared).map(j => s"common$j") ++
        (1 to unique).map(j => s"$tag$j")).mkString(" ")
    val pairs = (0 to 10).map { i =>
      val shared = i * 10
      val unique = 100 - shared
      (i.toLong, doc(shared, unique, s"a${i}_"), doc(shared, unique, s"b${i}_"))
    }
    val df = pairs.toDF("pair_id", "text_a", "text_b")

    val sigExpr = (c: String) =>
      graft.functions.HashFunctions.minhash_sig(
        expr(s"""array_distinct(transform(
             sequence(0, size(split($c, ' ')) - 3),
             i -> concat(split($c, ' ')[i], ' ', split($c, ' ')[i+1], ' ', split($c, ' ')[i+2])))"""))
    val withSigs = df.select(
      col("pair_id"),
      sigExpr("text_a").as("sig_a"), sigExpr("text_b").as("sig_b"),
      expr("""CAST(size(array_intersect(
           array_distinct(transform(sequence(0, size(split(text_a,' '))-3), i -> concat(split(text_a,' ')[i],' ',split(text_a,' ')[i+1],' ',split(text_a,' ')[i+2]))),
           array_distinct(transform(sequence(0, size(split(text_b,' '))-3), i -> concat(split(text_b,' ')[i],' ',split(text_b,' ')[i+1],' ',split(text_b,' ')[i+2]))))) AS DOUBLE)
         / size(array_union(
           array_distinct(transform(sequence(0, size(split(text_a,' '))-3), i -> concat(split(text_a,' ')[i],' ',split(text_a,' ')[i+1],' ',split(text_a,' ')[i+2]))),
           array_distinct(transform(sequence(0, size(split(text_b,' '))-3), i -> concat(split(text_b,' ')[i],' ',split(text_b,' ')[i+1],' ',split(text_b,' ')[i+2])))))""")
        .as("true_jaccard"))
      .withColumn("est_sim",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (a, v) -> a + v)")
          .cast("double") / 16.0)
      .collect()

    withSigs.foreach { r =>
      val (tj, est) = (r.getDouble(3), r.getDouble(4))
      // 16 permutations: std ~ sqrt(j(1-j)/16) <= 0.125; allow 3 sigma
      assert(math.abs(est - tj) <= 0.4,
        s"pair ${r.getLong(0)}: true=$tj est=$est")
    }
    // monotone-ish: fully-disjoint pair estimates below fully-shared pair
    val byId = withSigs.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(byId(0) < byId(10))
    assert(byId(10) == 1.0) // identical shingle sets => identical sigs
  }

}
