package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest-served data skipping (round-10 verdict item 2): per-file
  * min/max recorded at commit time must let a selective predicate open
  * only the stat-matching files — structurally asserted via
  * `df.inputFiles` — with correctness never depending on the stats
  * (residual filter, conservative fallbacks). */
class SkipReadSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int) = spark.range(n.toLong)
    .select(lit("a").as("p"), col("id").as("v"),
      (col("id") * 2).as("payload"))

  test("a 5% band opens only stat-matching files, from the manifest alone") {
    val root = tmpDir("skip-band")
    SnapshotTable.write(spark, root, rows(100000), Seq("p"),
      filesPerPartition = 32, statsFor = Seq("v"), clusterBy = Seq("v"))
    val full = SnapshotTable.read(spark, root)
    val allFiles = full.inputFiles.length
    assert(allFiles >= 16, s"expected a multi-file layout, got $allFiles")

    val band = SnapshotTable.readBetween(spark, root, "v", 50000L, 54999L)
    // 5% of the value range over range-clustered files: a handful of
    // files, not the whole partition — and no directory listing was
    // needed to decide (the manifest carries the census)
    val opened = band.inputFiles.length
    assert(opened <= (allFiles / 4).max(2),
      s"stats pruning opened $opened of $allFiles files")
    assert(band.count() == 5000)
    val expect = full.filter(col("v").between(50000L, 54999L))
      .agg(sum(col("payload"))).collect()(0).getLong(0)
    val got = band.agg(sum(col("payload"))).collect()(0).getLong(0)
    assert(got == expect, "pruned read changed the aggregate")
  }

  test("stats recompute for rewritten partitions and carry for untouched") {
    val root = tmpDir("skip-upsert")
    val two = spark.range(2000L)
      .select(when(col("id") < 1000, "a").otherwise("b").as("p"),
        col("id").as("v"), (col("id") * 3).as("payload"))
    SnapshotTable.write(spark, root, two, Seq("p"),
      filesPerPartition = 8, statsFor = Seq("v"), clusterBy = Seq("v"))
    // upsert touches ONLY partition b (moves some v values far away)
    val updates = spark.range(1500L, 1600L)
      .select(lit("b").as("p"), col("id").as("v"),
        lit(999999L).as("payload"))
      .withColumn("v", col("v") + 100000L)
    // key = v for this table (unique)
    SnapshotTable.upsert(spark, root, updates, "v", Seq("p"),
      filesPerPartition = 8)
    // the new far-away values are found via stats on the REWRITTEN dir
    val far = SnapshotTable.readBetween(spark, root, "v", 101500L, 101599L)
    assert(far.count() == 100)
    assert(far.inputFiles.length < SnapshotTable.read(spark, root)
      .inputFiles.length,
      "far-band read should not open every file")
    // untouched partition a still prunes from carried-forward stats
    val lowBand = SnapshotTable.readBetween(spark, root, "v", 0L, 99L)
    assert(lowBand.count() == 100)
    assert(lowBand.inputFiles.length <= 4,
      s"carried stats should prune partition a: ${lowBand.inputFiles.length}")
  }

  test("NULL semantics: all-null files skip, partial-null files match") {
    val root = tmpDir("skip-null")
    val mixed = spark.range(300L).select(
      when(col("id") < 100, "lo")
        .when(col("id") < 200, "nulls").otherwise("hi").as("p"),
      when(col("id") >= 100 && col("id") < 200, lit(null).cast("long"))
        .otherwise(col("id")).as("v"))
    SnapshotTable.write(spark, root, mixed, Seq("p"),
      statsFor = Seq("v"))
    val band = SnapshotTable.readBetween(spark, root, "v", 0L, 50L)
    assert(band.count() == 51)
    // the all-null partition's file is census-listed yet skipped: no
    // BETWEEN can match a NULL
    val opened = band.inputFiles.map(_.toString)
    assert(opened.nonEmpty && band.inputFiles.length <
      SnapshotTable.read(spark, root).inputFiles.length)
  }

  test("string-typed bounds prune in cast-to-string order") {
    val root = tmpDir("skip-str")
    val dated = spark.range(365L).select(
      lit("a").as("p"),
      date_format(date_add(lit("2026-01-01"), col("id").cast("int")),
        "yyyy-MM-dd").as("d"),
      col("id").as("payload"))
    SnapshotTable.write(spark, root, dated, Seq("p"),
      filesPerPartition = 12, statsFor = Seq("d"), clusterBy = Seq("d"))
    val feb = SnapshotTable.readBetween(
      spark, root, "d", "2026-02-01", "2026-02-28")
    assert(feb.count() == 28)
    assert(feb.inputFiles.length <= 4,
      s"date band should prune: ${feb.inputFiles.length} files")
  }

  test("no stats declaration degrades to a plain filtered read") {
    val root = tmpDir("skip-none")
    SnapshotTable.write(spark, root, rows(1000), Seq("p"))
    val band = SnapshotTable.readBetween(spark, root, "v", 10L, 19L)
    assert(band.count() == 10)
  }

  test("an empty pruned set returns a typed empty frame") {
    val root = tmpDir("skip-empty")
    SnapshotTable.write(spark, root, rows(1000), Seq("p"),
      statsFor = Seq("v"))
    val none = SnapshotTable.readBetween(spark, root, "v", 5000L, 6000L)
    assert(none.count() == 0)
    assert(none.columns.toSeq == Seq("p", "v", "payload"))
  }

  test("two-column predicates intersect keep-sets: fewer files than either") {
    // (x, y) grid, clustered lexicographically by (x, y): each x value
    // spans several files, each covering a y sub-range — so an x band
    // prunes to its files, a y band keeps one file per x value, and the
    // CONJUNCTION must open strictly fewer than either alone
    val root = tmpDir("skip-multi")
    val grid = spark.range(64000L).select(
      lit("a").as("p"), (col("id") % 8).as("x"),
      ((col("id") / 8) % 1000).as("y"), (col("id") * 3).as("payload"))
    SnapshotTable.write(spark, root, grid, Seq("p"),
      filesPerPartition = 32, statsFor = Seq("x", "y"),
      clusterBy = Seq("x", "y"))
    val xOnly = SnapshotTable.readBetween(spark, root, "x", 3L, 3L)
      .inputFiles.length
    val yOnly = SnapshotTable.readBetween(spark, root, "y", 100L, 199L)
      .inputFiles.length
    val both = SnapshotTable.readBetweenAll(spark, root,
      Seq(("x", 3L, 3L), ("y", 100L, 199L)))
    assert(both.inputFiles.length < math.min(xOnly, yOnly),
      s"conjunction opened ${both.inputFiles.length} files vs " +
        s"x-only $xOnly, y-only $yOnly")
    // and the pruned conjunction returns exactly the filtered rows
    val expect = SnapshotTable.read(spark, root)
      .filter(col("x") === 3L && col("y").between(100L, 199L))
      .agg(count(lit(1)), sum(col("payload"))).collect()(0)
    val got = both.agg(count(lit(1)), sum(col("payload"))).collect()(0)
    assert(got == expect, s"conjunctive pruned read diverged: $got")
  }

  test("CDC mutations keep the skipping table correct end-to-end") {
    // applyChanges (mixed upsert + tombstone) over a stats table: the
    // rewritten partition's stats regenerate, and the pruned read
    // agrees with the full read after the change batch.
    val root = tmpDir("skip-cdc")
    val base = spark.range(4000L).select(
      when(col("id") % 2 === 0, "even").otherwise("odd").as("p"),
      col("id").as("v"), (col("id") * 7).as("payload"))
    SnapshotTable.write(spark, root, base, Seq("p"),
      filesPerPartition = 4, statsFor = Seq("v"), clusterBy = Seq("v"))
    val changes = spark.range(0L, 100L).select(
      lit("even").as("p"), (col("id") * 2).as("v"),
      lit(-1L).as("payload"),
      when(col("id") < 50, "d").otherwise("u").as("op"))
    SnapshotTable.applyChanges(spark, root, changes, "v", Seq("p"), "op")
    val full = SnapshotTable.read(spark, root)
    val band = SnapshotTable.readBetween(spark, root, "v", 0L, 399L)
    val expect = full.filter(col("v").between(0L, 399L))
      .agg(count(lit(1)), sum(col("payload"))).collect()(0)
    val got = band.agg(count(lit(1)), sum(col("payload"))).collect()(0)
    assert(got == expect,
      s"post-CDC pruned read diverged: $got vs $expect")
    assert(band.inputFiles.length < full.inputFiles.length)
  }
}
