package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Pii

/** Corpus-prep lane semantics: packing math against the naive window
  * form, PII detection/redaction on PII-bearing fixtures (the synthetic
  * corpus has none — the oracle gate pins the zeros, THESE tests pin the
  * behavior), span-dedup ground truth, and KMV error bands. */
class CorpusSpec extends SparkSpec {
  private val sf1 = "/root/testdata/sf0.001"
  import spark.implicits._

  test("t26 equals the naive per-source window formulation") {
    val docs = graft.core.Tables(spark, sf1, "documents")
    val got = Corpus.seqPack(docs).collect()

    val toks = docs.select(col("doc_id"), col("source"),
      expr("CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT)")
        .as("n_tok"))
    val ctx = Corpus.PackCtx
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = toks
      .withColumn("cum", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"),
        sum(when(col("n_tok") > 0 &&
            floor(col("cum") / ctx.toDouble) =!=
              floor((col("cum") + col("n_tok") - 1) / ctx.toDouble), 1L)
          .otherwise(0L)).as("crossing_docs"))
      .withColumn("n_bins",
        expr(s"CAST((total_tokens + ${ctx - 1}) DIV $ctx AS BIGINT)"))
      .withColumn("fill_ratio",
        col("total_tokens").cast("double") / (col("n_bins") * ctx))
      .orderBy(col("source")).collect()

    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, e) => assert(g == e, s"$g != $e") }
    // packing sanity: bins exist, fill is a ratio, and at least one doc
    // straddles a 2048-token boundary in a corpus of ~55-token docs
    val row = got.head
    assert(row.getAs[Long]("n_bins") > 0)
    assert(row.getAs[Double]("fill_ratio") > 0.5 &&
      row.getAs[Double]("fill_ratio") <= 1.0)
    assert(got.map(_.getAs[Long]("crossing_docs")).sum > 0,
      s"no doc crosses a ${Corpus.PackCtx}-token boundary — packing math untested")
  }

  test("PII detection counts every class on PII-bearing text") {
    val df = Seq(
      (1L, "contact john.doe+spam@example.co.uk or admin@internal.io now", "a"),
      (2L, "server at 10.0.0.1 fell over; failover to 192.168.255.254", "a"),
      (3L, "call 555-123-4567 or 555.987.6543 after 5", "b"),
      (4L, "no pii here just plain words and 42 numbers", "b"),
      (5L, "mixed: bob@x.org from 172.16.0.9 dialed 800-555-0199", "c")
    ).toDF("doc_id", "text", "source")
    val got = df.select(
      col("doc_id"),
      Pii.emailHits(col("text")).as("e"),
      Pii.ipv4Hits(col("text")).as("ip"),
      Pii.phoneHits(col("text")).as("ph"),
      Pii.hasPii(col("text")).as("any"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(1L) == ((2L, 0L, 0L, true)))
    assert(got(2L) == ((0L, 2L, 0L, true)))
    assert(got(3L) == ((0L, 0L, 2L, true)))
    assert(got(4L) == ((0L, 0L, 0L, false)))
    assert(got(5L) == ((1L, 1L, 1L, true)))
  }

  test("PII redaction replaces every class and nothing else") {
    val df = Seq(
      ("email bob@x.org then ip 10.0.0.1 then phone 555-123-4567 end", 1L)
    ).toDF("text", "id")
    val red = df.select(Pii.redact(col("text")).as("r")).head.getString(0)
    assert(red == "email [EMAIL] then ip [IP] then phone [PHONE] end", red)
    // idempotent on clean text
    val clean = "just plain words with a trailing dot."
    val red2 = Seq((clean, 1L)).toDF("text", "id")
      .select(Pii.redact(col("text")).as("r")).head.getString(0)
    assert(red2 == clean)
    // redaction order: a phone-shaped email local part is ONE email —
    // phone-first would shred it into [PHONE]@x.co
    val tricky = Seq(("mail 555-123-4567@x.co sent", 1L)).toDF("text", "id")
      .select(Pii.redact(col("text")).as("r")).head.getString(0)
    assert(tricky == "mail [EMAIL] sent", tricky)
  }

  test("t27 per-source rollup: zero PII on the synthetic corpus, nonzero scan signal") {
    val rows = Corpus.piiScan(graft.core.Tables(spark, sf1, "documents"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("email_hits") == 0L &&
        r.getAs[Long]("ipv4_hits") == 0L &&
        r.getAs[Long]("phone_hits") == 0L && r.getAs[Long]("pii_docs") == 0L,
        s"synthetic corpus unexpectedly contains PII: $r")
      assert(r.getAs[Long]("long_tok_hits") > 0L,
        "scan signal is zero — the pipeline may not be reading text")
    }
  }

  test("gopher rules fire for the right reasons on fixture docs") {
    val good = ("the quick brown fox jumps over a lazy dog and then " * 6).trim
    val short_ = "the quick a fox"                       // < 50 words
    val noStops = ("lorem ipsum dolor sit amet consectetur " * 9).trim // no stopword
    val longWords = ("the a " +
      "internationalization incomprehensibilities " * 30).trim // mean len > 10
    val df = Seq((1L, good, "s"), (2L, short_, "s"), (3L, noStops, "s"),
      (4L, longWords, "s")).toDF("doc_id", "text", "source")
    val got = Corpus.gopherFilter(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("passes")).toMap
    assert(got(1L), "well-formed doc should pass")
    assert(!got(2L), "sub-50-word doc should fail")
    assert(!got(3L), "stopword-free doc should fail")
    assert(!got(4L), "long-word doc should fail the mean-length band")
  }

  test("q61 grid is dense: every event type has exactly 24 hour slots") {
    val rows = EventAnalytics2.q61_hourly_anomaly
      .run(spark, "/root/testdata/sf0.001").collect()
    val perType = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perType.nonEmpty && perType.values.forall(_ == 24),
      s"grid not dense: $perType")
    // z-scores are centered: per type they sum to ~0
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val zsum = rs.map(_.getAs[Double]("z")).sum
      assert(math.abs(zsum) < 1e-3, s"z not centered for $t: $zsum")
    }
  }

  test("temperature mix: sqrt-rate on a skewed fixture, exact accept test") {
    // 400:100:25 docs -> target rates 0.25, 0.5, 1.0 (sqrt of 25/n).
    // The testdata corpus is source-uniform (rate 1.0 everywhere), so
    // the oracle gate alone never exercises a biting rate — this does.
    val rows = (1 to 400).map(i => (i.toLong, s"doc $i", "big")) ++
      (1 to 100).map(i => (1000L + i, s"doc b$i", "mid")) ++
      (1 to 25).map(i => (2000L + i, s"doc c$i", "small"))
    val got = Corpus.temperatureMix(
      rows.toDF("doc_id", "text", "source")).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sampled"),
          r.getAs[Double]("target_rate"))).toMap
    assert(got("small") == ((25L, 25L, 1.0)), "smallest source must keep all")
    assert(got("mid")._3 == 0.5 && got("big")._3 == 0.25)
    // achieved tracks target within binomial noise (md5 is uniform)
    val midRate = got("mid")._2.toDouble / 100
    val bigRate = got("big")._2.toDouble / 400
    assert(math.abs(midRate - 0.5) < 0.15, s"mid achieved $midRate")
    assert(math.abs(bigRate - 0.25) < 0.1, s"big achieved $bigRate")
    // temperature keeps MORE of the big source than full equalization
    assert(got("big")._2 > 25, "sqrt scaling should keep > min_docs of big")
  }

  test("span dedup ground truth on a constructed corpus") {
    // doc 1 and 2 share exactly one aligned 8-token run; doc 3 is unique;
    // doc 4 is an exact copy of doc 1 (every span duplicated)
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d1 = s"one two $shared tail1 tail2"
    val d2 = s"x $shared y z"
    val d3 = "q w e r t y u i o p"
    val df = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d1))
      .toDF("doc_id", "text")
    val got = Corpus.spanDedup(df).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_spans"),
        r.getAs[Long]("dup_spans"))).toMap
    // d1: 12 toks -> 5 spans; all 5 shared with d4 (exact copy); of those
    // the pure-shared window also matches d2
    assert(got(1L) == ((5L, 5L)))
    assert(got(4L) == ((5L, 5L)))
    // d2: 11 toks -> 4 spans; only the aligned pure-shared window (x..y z
    // offsets shift the rest) matches d1/d4
    assert(got(2L)._1 == 4L && got(2L)._2 == 1L)
    assert(got(3L) == ((3L, 0L)))
  }

  test("d18 finds real cross-doc spans in the corpus") {
    val rows = Corpus.spanDedup(
      graft.core.Tables(spark, sf1, "documents")).collect()
    assert(rows.length > 0)
    val dup = rows.count(_.getAs[Long]("dup_spans") > 0)
    assert(dup > 0, "no duplicated spans found — testdata drifted?")
    rows.foreach { r =>
      val share = r.getAs[Double]("dup_share")
      assert(share >= 0.0 && share <= 1.0, s"share out of range: $r")
      assert(r.getAs[Long]("dup_spans") <= r.getAs[Long]("n_spans"))
    }
  }

  test("KMV: exact below k, inside the error band above k") {
    // sf0.001 lineitem has ~200 distinct partkeys < k=1024: the sketch
    // IS the exact set
    val small = Corpus.kmvDistinct(
      graft.core.Tables(spark, sf1, "lineitem"), "l_partkey").head
    assert(small.getAs[Long]("k_actual") < 1024)
    assert(small.getAs[Double]("est_distinct") ==
      small.getAs[Long]("exact_distinct").toDouble)
    // sf0.01 has ~2000 distinct > k: estimate within the KMV band
    // (stderr ~ 1/sqrt(k-2) ~ 3.1%; assert a loose 15%)
    val big = Corpus.kmvDistinct(
      graft.core.Tables(spark, "/root/testdata/sf0.01", "lineitem"),
      "l_partkey").head
    assert(big.getAs[Long]("k_actual") == 1024)
    assert(big.getAs[Double]("rel_err") < 0.15,
      s"KMV estimate off by ${big.getAs[Double]("rel_err")}")
  }
}
