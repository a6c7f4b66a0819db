package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The distributed BPE trainer must reproduce the reference algorithm
  * (Sennrich et al. 2016) exactly: same merges in the same order, same
  * final segmentation, deterministic under any partitioning. */
class BpeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  // ---- single-node reference implementation ------------------------
  private type Vocab = Map[List[String], Long]

  private def refPairs(v: Vocab): Map[(String, String), Long] =
    v.toSeq.flatMap { case (syms, c) =>
      syms.zip(syms.tail).map(p => p -> c)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  private def refMerge(syms: List[String], a: String, b: String)
      : List[String] = syms match {
    case x :: y :: rest if x == a && y == b =>
      (a + b) :: refMerge(rest, a, b)
    case x :: rest => x :: refMerge(rest, a, b)
    case Nil => Nil
  }

  private def refLearn(words: Map[String, Long], n: Int)
      : (Seq[(String, String)], Vocab) = {
    var v: Vocab = words.map { case (w, c) => w.toList.map(_.toString) -> c }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < n) {
      val ps = refPairs(v).filter(_._2 > 1)
      if (ps.isEmpty) continue = false
      else {
        val (a, b) = ps.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += ((a, b))
        v = v.toSeq.map { case (s, c) => refMerge(s, a, b) -> c }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    (merges.toSeq, v)
  }

  private def corpusWords: Map[String, Long] =
    Tables(spark, sfDir, "documents")
      .select(explode(expr(graft.queries.Text.toksExpr)).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("learned merges equal the reference algorithm, in order") {
    val got = Bpe.learnMerges(Tables(spark, sfDir, "documents"), 12)
    val (exp, _) = refLearn(corpusWords, 12)
    assert(got == exp, s"\n got=$got\n exp=$exp")
    assert(got.size == 12, "corpus should support 12 merges at this SF")
  }

  test("applyMerges reproduces the trainer's segmentation on every word") {
    val merges = Bpe.learnMerges(Tables(spark, sfDir, "documents"), 8)
    val (_, refVocab) = refLearn(corpusWords, 8)
    import spark.implicits._
    val words = corpusWords.keys.toSeq.toDF("w")
    val got = Bpe.applyMerges(words, "w", "syms", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    val exp = refVocab.keys.map(s => s.mkString -> s).toMap
    // refVocab keys are segmentations; map back by joined word
    assert(got.keySet == exp.keySet)
    got.foreach { case (w, syms) =>
      assert(syms == exp(w), s"word '$w': got $syms expected ${exp(w)}")
    }
  }

  test("ShippedMerges IS learnMerges over its training corpus (provenance)") {
    // The frozen tokenizer artifact t39_bpe_encode ships must stay
    // exactly what the trainer produces on sf0.001 — drift between the
    // constant and the trainer (or a regenerated corpus) fails loudly
    // here instead of silently skewing the encode gate.
    val got = Bpe.learnMerges(Tables(spark, sfDir, "documents"), 16)
    assert(got == Bpe.ShippedMerges,
      s"\n trained=$got\n shipped=${Bpe.ShippedMerges}")
  }

  test("applyMergesToArray == applyMerges word-by-word (shared fold rule)") {
    // The shuffle-free doc-level encode must segment every word exactly
    // like the per-word path — same fold, different plumbing.
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("parser", "column", "scanner")),
      (2L, Seq("aaa", "x", "minor", "test", "lust")))
      .toDF("doc_id", "toks")
    val arr = Bpe.applyMergesToArray(docs, "toks", "enc", Bpe.ShippedMerges)
      .select(col("doc_id"), col("enc"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[String]](1).map(_.toList).toList)
      .toMap
    val perWord = Bpe.applyMerges(
        docs.select(explode(col("toks")).as("w")).distinct(),
        "w", "syms", Bpe.ShippedMerges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    val toks = Map(1L -> List("parser", "column", "scanner"),
      2L -> List("aaa", "x", "minor", "test", "lust"))
    toks.foreach { case (id, ws) =>
      assert(arr(id) == ws.map(perWord),
        s"doc $id: ${arr(id)} vs ${ws.map(perWord)}")
    }
    // spot-check the absolute segmentation too (not only consistency)
    assert(perWord("parser") == List("par", "s", "er"))
    assert(perWord("column") == List("colum", "n"))
    assert(perWord("scanner") == List("scan", "n", "er"))
  }

  test("encodeWithRanks == applyMerges on the gated corpus and beyond") {
    import spark.implicits._
    // the t39 corpus's whole vocabulary through both paths
    val words = corpusWords.keys.toSeq.sorted.toDF("w")
    val fold = Bpe.applyMerges(words, "w", "syms", Bpe.ShippedMerges)
      .select(col("w"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val fast = Bpe.encodeWithRanks(
        words.select(col("w"), array(col("w")).as("toks")),
        "toks", "enc", Bpe.ShippedMerges)
      .select(col("w"), element_at(col("enc"), 1)).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(fold.nonEmpty && fast == fold,
      s"rank encoder diverged on ${fast.count { case (k, v) => fold(k) != v }} words")
  }

  test("rank encoder honors merge ORDER when products collide") {
    // Adversarial list: rank 0 = ("ab","c"), rank 1 = ("a","b").
    // Sequential semantics on "abc": round 0 is a no-op (symbol "ab"
    // does not exist yet), round 1 makes [ab, c] — and "ab","c" is
    // NEVER merged, its round already passed. An unconstrained
    // min-rank-present loop would merge it (wrongly); the monotone
    // rank constraint must not.
    import spark.implicits._
    val merges = Seq(("ab", "c"), ("a", "b"))
    val df = Seq("abc").toDF("w")
    val fold = Bpe.applyMerges(df, "w", "syms", merges)
      .select(col("syms")).collect()(0).getSeq[String](0)
    val fast = Bpe.encodeWithRanks(
        df.select(array(col("w")).as("toks")), "toks", "enc", merges)
      .select(element_at(col("enc"), 1)).collect()(0).getSeq[String](0)
    assert(fold == Seq("ab", "c"), s"fold semantics moved: $fold")
    assert(fast == fold, s"rank encoder diverged on collision: $fast")
  }

  test("property: rank encoder == fold on random merge lists") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val alphabet = "abcd"
    (1 to 4).foreach { _ =>
      val wordList = Seq.fill(12)(
        (0 until rnd.nextInt(8) + 1)
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      // random merges over random symbol fragments (products included,
      // so coincidences and chained products occur naturally)
      var symbols = alphabet.map(_.toString).toVector
      val merges = (0 until 12).map { _ =>
        val a = symbols(rnd.nextInt(symbols.size))
        val b = symbols(rnd.nextInt(symbols.size))
        symbols = symbols :+ (a + b)
        (a, b)
      }.distinct
      val df = wordList.distinct.toDF("w")
      val fold = Bpe.applyMerges(df, "w", "syms", merges)
        .select(col("w"), col("syms")).collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val fast = Bpe.encodeWithRanks(
          df.select(col("w"), array(col("w")).as("toks")),
          "toks", "enc", merges)
        .select(col("w"), element_at(col("enc"), 1)).collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(fast == fold,
        s"diverged for merges=$merges on ${wordList.distinct}")
    }
  }

  test("16k merges: ONE projection, bounded plan, bounded runtime") {
    // The production bound the chained-projection path cannot give
    // (16k chained nested-lambda Projects = thousands of codegen
    // units): the rank encoder's plan must not grow with the merge
    // count at all — one UDF projection — and encoding a real word
    // list under a 16k-entry table must complete promptly.
    import spark.implicits._
    var symbols = ('a' to 'z').map(_.toString).toVector
    val rnd = new scala.util.Random(23)
    val merges16k = (0 until 16384).map { _ =>
      val a = symbols(rnd.nextInt(symbols.size))
      val b = symbols(rnd.nextInt(symbols.size))
      symbols = symbols :+ (a + b)
      (a, b)
    }.distinct
    assert(merges16k.size > 15000, s"degenerate list: ${merges16k.size}")
    val wordSeq = corpusWords.keys.toSeq.sorted.take(200)
    val words = wordSeq.toDF("w")
      .select(col("w"), array(col("w")).as("toks"))
    val encoded = Bpe.encodeWithRanks(words, "toks", "enc", merges16k)
    val plan = encoded.queryExecution.analyzed.toString
    assert(plan.linesIterator.size < 20,
      s"plan must stay constant-depth at 16k merges:\n$plan")
    val t0 = System.nanoTime()
    val n = encoded.select(element_at(col("enc"), 1)).collect().length
    val sec = (System.nanoTime() - t0) / 1e9
    assert(n == wordSeq.size)
    assert(sec < 30.0, s"16k-merge encode took ${sec}s")
  }

    test("training is deterministic (tie-break pinned)") {
    val a = Bpe.learnMerges(Tables(spark, sfDir, "documents"), 6)
    val b = Bpe.learnMerges(
      Tables(spark, sfDir, "documents").repartition(7), 6)
    assert(a == b, "merge order must not depend on partitioning")
  }

  test("stops early when no pair repeats") {
    import spark.implicits._
    val docs = Seq("a b c", "d e f").toDF("text")
    assert(Bpe.learnMerges(docs, 10).isEmpty)
  }

  test("256 merges: incremental pair maintenance equals a full recount") {
    // The production-scale claim (round-8 verdict item 5): per-round
    // cost is pair-delta-bounded, so hundreds of merges are feasible —
    // and the maintained pair table must equal what a full per-round
    // recount (the single-node reference) computes at EVERY round, or
    // the merge sequence diverges at the first drift. A rich random
    // corpus (2000 draws over a 6-letter alphabet, words of 4-12
    // chars) drives deep merge chains where a wrong delta — e.g. an
    // overlap case, or a pair dropped at n=1 that a later delta should
    // have revived — surfaces as a wrong merge.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(2000)(
      Seq.fill(4 + rnd.nextInt(9))("abcdef" (rnd.nextInt(6))).mkString)
    val docs = words.grouped(20).map(_.mkString(" ")).toSeq.toDF("text")
    val counts = words.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = Bpe.learnMerges(docs, 256)
    val (exp, refVocab) = refLearn(counts, 256)
    assert(got.size == 256,
      s"corpus too small for the 256-merge property (${got.size}) — enlarge it")
    assert(got == exp,
      s"incremental trainer diverged from the reference at merge " +
        s"${got.zip(exp).indexWhere { case (g, e) => g != e }}")
    // chunked encode (bounded plan depth) reproduces the trainer's
    // segmentation through multiple checkpoint chunks
    val enc = Bpe.applyMerges(counts.keys.toSeq.toDF("w"), "w", "s", got,
        checkpointEvery = 64)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    refVocab.keys.foreach(s =>
      assert(enc(s.mkString) == s,
        s"chunked encode diverged on '${s.mkString}'"))
  }

  test("property: random corpora match the reference algorithm") {
    // adversarial small alphabets force heavy merge collisions and
    // overlapping-pair cases (aaa, abab) that the fixed corpus may miss
    import org.scalacheck.Gen
    import spark.implicits._
    val wordGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val corpusGen = Gen.choose(5, 20).flatMap(n => Gen.listOfN(n, wordGen))
    (0 until 4).foreach { seed =>
      val words = corpusGen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong)).get
      val docs = words.grouped(5).map(_.mkString(" ")).toSeq.toDF("text")
      val got = Bpe.learnMerges(docs, 4)
      val counts = words.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val (exp, refVocab) = refLearn(counts, 4)
      assert(got == exp, s"seed=$seed corpus=$words\n got=$got\n exp=$exp")
      // encode path agrees on every distinct word too
      val enc = Bpe.applyMerges(counts.keys.toSeq.toDF("w"), "w", "s", got)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
        .toMap
      refVocab.keys.foreach(s =>
        assert(enc(s.mkString) == s, s"seed=$seed word=${s.mkString}"))
    }
  }
}
