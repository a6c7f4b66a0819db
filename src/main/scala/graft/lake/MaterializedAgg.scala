package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Incrementally maintained materialized aggregate over a
  * [[SnapshotTable]] — the "don't recompute a 100 TB rollup because
  * 1k rows changed" layer.
  *
  * The reference's users run the same per-partition rollups on every
  * dashboard refresh (endpoint × date counts —
  * reference/README.md:74-99); at warehouse scale the input is
  * petabytes while the daily change is a few partitions. This object
  * maintains `SELECT g1..gk, SUM(..), AVG(..), MIN(..), MAX(..),
  * COUNT(*) GROUP BY g1..gk` as its own [[SnapshotTable]], and a
  * [[refresh]] costs O(changed partitions), not O(table):
  *
  *  1. WHAT CHANGED is read off the base table's MANIFESTS alone:
  *     directories are immutable and every commit maps each partition
  *     tuple to a directory name, so diffing the manifest of the
  *     last-applied base version B against the latest base version L
  *     yields exactly the added/removed/rewritten partition tuples —
  *     no data comparison, no change log, metadata-sized work.
  *  2. The SUM/COUNT DELTA is `agg(changed-at-L) − agg(changed-at-B)`:
  *     both sides are manifest-pruned reads of only the changed
  *     tuples' directories (the old version's directories are still
  *     present until vacuumed — the time-travel contract doing
  *     incremental-view duty). SUM and COUNT form a commutative
  *     group, so the signed union re-aggregates into a per-group
  *     delta. Alongside each sum a NON-NULL COUNT is maintained (same
  *     group ring), so a group whose inputs are all NULL reads back
  *     as SQL's NULL sum, not a normalized 0 — incremental and full
  *     recompute agree on NULL semantics exactly.
  *  3. MIN/MAX are NOT group-invertible (a deleted row can hold the
  *     extremum), so they are maintained by PARTIAL-AGGREGATE
  *     DECOMPOSITION instead: a sidecar table (`<mvRoot>/_mvpartials`,
  *     itself a SnapshotTable) holds per-(group, base-directory)
  *     min/max partials. Directories are immutable, so a base commit
  *     invalidates exactly the changed tuples' partials: recompute
  *     them from the changed directories at L (data already being
  *     read for the sum delta's insertion side), tombstone the
  *     retired directories' rows, and re-derive each AFFECTED group's
  *     extremum as `min/max over its partials` — a scan of the
  *     metadata-sized sidecar, never of unchanged base data. Deleting
  *     the current minimum of a group therefore never rescans the
  *     table; it rescans one partition (already rewritten by the
  *     delete itself) plus the sidecar.
  *  4. AVG is derived, not stored: `SUM / non-null COUNT` at read
  *     time (internally maintained as a hidden sum), NULL when the
  *     group has no non-null values — matching SQL AVG under deletes
  *     for free.
  *  5. The delta MERGES into the view by key: the view is bucketed by
  *     `xxhash64(group key) % nBuckets` (stable per key, bounded
  *     directory count even for high-cardinality groups), only
  *     buckets holding affected keys are read, and the merged rows
  *     commit through [[SnapshotTable.applyChanges]] — groups whose
  *     count reaches zero leave as tombstones, everything lands in
  *     ONE atomic version.
  *
  * Integral/decimal sums maintain EXACTLY (group inverse is exact);
  * float sums drift by reassociation, same caveat as any engine's
  * incremental view maintenance. MIN/MAX have no drift: they are
  * recomputed, never inverted.
  *
  * Crash/replay protocol (single-maintainer, like
  * [[SnapshotTable.vacuum]]): a marker file `_mv/applied-v<N>` records
  * which base version view version N reflects, and is published
  * create-exclusively BEFORE the view commit it describes. A crash
  * between marker and commit leaves a marker for a version that does
  * not exist — the next refresh deletes it and recomputes from the
  * intact previous marker. The partials sidecar updates BEFORE the
  * marker and is idempotent (retired-directory tombstones + same-value
  * re-upserts), so replaying a crashed refresh converges. Vacuuming
  * the base below the last-applied version breaks the incremental path
  * loudly; [[appliedBaseVersion]] exists to be passed to the base
  * table's vacuum `protect` set.
  */
object MaterializedAgg {

  /** The maintained aggregate: `GROUP BY groupBy` with one output
    * column per (name, sql-expression) in `sums` (each `SUM(expr)`),
    * `avgs` (each `AVG(expr)`, derived at read time), `mins`/`maxs`
    * (each `MIN(expr)`/`MAX(expr)`, maintained via the partials
    * sidecar), `kmvs` (each an approximate `COUNT(DISTINCT expr)` —
    * exact below `kmvK` — maintained as per-(group, directory)
    * K-minimum-values sketches in the same sidecar), plus a `COUNT(*)`
    * as `countName`.
    *
    * KMV maintenance (round-12 verdict item 6): COUNT(DISTINCT) is not
    * group-invertible (deleting a row may or may not remove a distinct
    * value), so it rides the min/max partials machinery: each sidecar
    * row stores the k smallest distinct `md5`-hashes of the expression
    * within one (group, base-directory); a refresh recomputes exactly
    * the changed directories' sketches, tombstones retired ones, and
    * re-derives each affected group's estimate by merging its partial
    * sketches (k smallest of the union — KMV's mergeability) from the
    * metadata-sized sidecar, never rescanning unchanged base data. The
    * hash is the q60 rule (first 15 hex digits of md5 as a 60-bit
    * integer), bit-identical in DuckDB, so estimates are oracle-
    * checkable; below k the sketch IS the distinct set and the
    * "estimate" is exact. */
  final case class MvSpec(
      groupBy: Seq[String],
      sums: Seq[(String, String)],
      countName: String = "n_rows",
      avgs: Seq[(String, String)] = Nil,
      mins: Seq[(String, String)] = Nil,
      maxs: Seq[(String, String)] = Nil,
      kmvs: Seq[(String, String)] = Nil,
      kmvK: Int = 1024) {
    require(groupBy.nonEmpty, "groupBy must name at least one column")
    require(sums.nonEmpty, "at least one SUM column required")
    require(kmvK > 1, "kmvK must exceed 1 (the estimator divides by " +
      "the k-th minimum and needs k-1 > 0)")
    /** Internally maintained sums: user sums plus one hidden sum per
      * AVG (the numerator; the denominator is its non-null count). */
    private[lake] def effSums: Seq[(String, String)] =
      sums ++ avgs.map { case (n, e) => (s"_mv_avg_$n", e) }
    private[lake] def mmNames: Seq[String] =
      mins.map(_._1) ++ maxs.map(_._1)
    /** Every column maintained through the partials sidecar. */
    private[lake] def auxNames: Seq[String] =
      mmNames ++ kmvs.map(_._1)
    val outNames: Seq[String] =
      sums.map(_._1) ++ avgs.map(_._1) ++ mins.map(_._1) ++
        maxs.map(_._1) ++ kmvs.map(_._1) :+ countName
    require(outNames.distinct.size == outNames.size &&
      outNames.forall(n => !groupBy.contains(n)),
      "aggregate output names must be distinct and not group columns")
    require(outNames.forall(n => !n.startsWith("_mv_")),
      "output names must not use the reserved _mv_ prefix")
  }

  private[lake] val KeyCol = "_mv_key"
  private[lake] val BucketCol = "_mv_bucket"
  // partials sidecar columns
  private[lake] val DirCol = "_mv_dir"
  private[lake] val AKeyCol = "_mv_akey"
  private[lake] val ABucketCol = "_mv_abucket"

  private[lake] def nnName(sumName: String) = s"_mv_nn_$sumName"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mvMeta(root: String) = new Path(root, "_mv")
  private[lake] def auxRoot(mvRoot: String): String =
    new Path(mvRoot, "_mvpartials").toString

  /** Composite group key, INJECTIVE by construction: each group value
    * renders as `<charlen>:<value>` (NULL as `n`), components joined
    * with `|`. Length prefixes make the encoding self-delimiting, so
    * no group value can collide two distinct tuples — no control-char
    * sentinels needed (round-11 advice items 2 and 3). */
  private[lake] def keyExpr(spec: MvSpec): Column = {
    val comps = spec.groupBy.map { c =>
      val s = col(c).cast("string")
      when(s.isNull, lit("n"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    concat(comps.flatMap(c => Seq(lit("|"), c)).tail: _*)
  }

  private[lake] def bucketExpr(nBuckets: Int): Column =
    pmod(xxhash64(col(KeyCol)), lit(nBuckets.toLong))

  /** The base directory a row came from, as the manifest-relative dir
    * string — layout is `<root>/data/<dirname>/<file>.parquet`, so the
    * second-to-last path component is the directory name. */
  private def dirExpr: Column =
    concat(lit("data/"), element_at(split(input_file_name(), "/"), -2))

  /** Aggregate output types are pinned ONCE (from the base schema at
    * init) and every later frame casts to them: Spark widens decimals
    * on sum-of-sum / add, and a drifting view schema would poison
    * parquet schema-merge across versions. Returns (per-effective-sum
    * types, per-min/max types). */
  private def pinTypes(
      base: DataFrame, spec: MvSpec): (Seq[DataType], Seq[DataType]) = {
    val sumAggs = spec.effSums.map { case (n, e) => sum(expr(e)).as(n) }
    val mmAggs = spec.mins.map { case (n, e) => min(expr(e)).as(n) } ++
      spec.maxs.map { case (n, e) => max(expr(e)).as(n) }
    val aggs = sumAggs ++ mmAggs
    val schema = base.groupBy(spec.groupBy.map(col): _*)
      .agg(aggs.head, aggs.tail: _*).schema
    (spec.effSums.map { case (n, _) => schema(n).dataType },
      spec.mmNames.map(n => schema(n).dataType))
  }

  /** Signed partial aggregate of `rows`: +1 = additions, -1 =
    * retractions. Output: group cols, sums (cast to `types`), per-sum
    * signed non-null counts, signed count. */
  private[lake] def aggFrame(
      rows: DataFrame, spec: MvSpec, types: Seq[DataType],
      sign: Int): DataFrame = {
    val sumAggs = spec.effSums.zip(types).map { case ((n, e), t) =>
      val s = sum(expr(e))
      (if (sign < 0) -s else s).cast(t).as(n)
    }
    val nnAggs = spec.effSums.map { case (n, e) =>
      sum(when(expr(e).isNotNull, lit(sign.toLong)).otherwise(lit(0L)))
        .cast(LongType).as(nnName(n))
    }
    val aggs = sumAggs ++ nnAggs :+
      sum(lit(sign.toLong)).cast(LongType).as(spec.countName)
    rows.groupBy(spec.groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The q60 hash rule — first 15 hex digits of md5 as a 60-bit long —
    * the ONE hash Spark and DuckDB compute bit-identically, so KMV
    * estimates are cross-engine checkable. NULL inputs hash to NULL
    * (and are filtered out: COUNT(DISTINCT) ignores NULLs). */
  private def hvExpr(e: String): Column =
    conv(substring(md5(expr(e).cast("string")), 1, 15), 16, 10)
      .cast(LongType)

  /** The 60-bit hash domain size, as the q60 estimator uses it. */
  private val KmvDomain = 1152921504606846976L

  /** KMV estimate off (k_actual, kth_min): exact below k, else the
    * standard (k-1) · domain / kth-minimum estimator — the EXACT
    * expression shape q60 gates, so doubles match DuckDB bit-wise. */
  private def kmvEstimate(k: Int, ka: Column, kth: Column): Column =
    when(ka < k, ka.cast("double"))
      .otherwise((ka.cast("double") - lit(1.0)) * lit(KmvDomain) / kth)

  /** Per-(group, base-directory) partials over `rows` — the sidecar's
    * content for the directories `rows` spans: min/max values plus one
    * KMV sketch array (k smallest distinct hashes) per `kmvs` entry.
    * Sketches build shuffle/sort-bounded — distinct (group, dir, hash)
    * triples rank through a window, never an unbounded in-memory set —
    * so a directory with millions of distinct values costs a spillable
    * sort, not an aggregation buffer. Every (group, dir) present in
    * `rows` gets a sidecar row even when all sketch inputs are NULL
    * (empty array), so group-level re-derivation can never mistake
    * "all values deleted" for "no information". */
  private[lake] def partialsFrame(
      rows: DataFrame, spec: MvSpec, mmTypes: Seq[DataType],
      nBuckets: Int): DataFrame = {
    val mmAggs = (spec.mins.map { case (n, e) => (n, e, true) } ++
      spec.maxs.map { case (n, e) => (n, e, false) })
      .zip(mmTypes).map { case ((n, e, isMin), t) =>
        (if (isMin) min(expr(e)) else max(expr(e))).cast(t).as(n)
      }
    // a kmv-only spec still needs one agg to anchor the (group, dir)
    // row universe; the partial row count is harmless and only exists
    // on sidecars of such specs (legacy min/max sidecars keep their
    // schema exactly)
    val aggs =
      if (mmAggs.nonEmpty) mmAggs
      else Seq(count(lit(1)).cast(LongType).as("_mv_pn"))
    val keyed = rows.withColumn(KeyCol, keyExpr(spec))
      .withColumn(DirCol, dirExpr)
    val anchored = keyed.groupBy(col(KeyCol), col(DirCol))
      .agg(aggs.head, aggs.tail: _*)
    val withSketches = spec.kmvs.foldLeft(anchored) { case (acc, (n, e)) =>
      val hv = keyed.select(col(KeyCol), col(DirCol),
          hvExpr(e).as("_mv_hv"))
        .where(col("_mv_hv").isNotNull).distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(KeyCol), col(DirCol)).orderBy(col("_mv_hv"))
      val sk = hv.withColumn("_mv_rn", row_number().over(w))
        .where(col("_mv_rn") <= spec.kmvK)
        .groupBy(col(KeyCol), col(DirCol))
        .agg(sort_array(collect_list(col("_mv_hv"))).as(n))
      acc.join(sk, Seq(KeyCol, DirCol), "left")
        .withColumn(n, coalesce(col(n), array().cast("array<long>")))
    }
    withSketches
      .withColumn(AKeyCol, concat(col(KeyCol), lit("|"), col(DirCol)))
      .withColumn(ABucketCol, pmod(xxhash64(col(DirCol)),
        lit(nBuckets.toLong)))
  }

  /** min/max/KMV per group over the sidecar's partials, restricted to
    * `keys` — the re-derivation step. min/max fold directly; KMV
    * merges by keeping the k smallest of the union of the group's
    * partial sketches (the sketch's mergeability), then derives the
    * estimate. The sidecar is metadata-sized (|groups × directories
    * they span| rows, sketch arrays ≤ k longs), so this scan is the
    * incremental analog of reading the manifest, not the table. */
  private[lake] def rollup(
      aux: DataFrame, spec: MvSpec, keys: DataFrame): DataFrame = {
    val aggs = spec.mins.map { case (n, _) => min(col(n)).as(n) } ++
      spec.maxs.map { case (n, _) => max(col(n)).as(n) } ++
      spec.kmvs.map { case (n, _) =>
        flatten(collect_list(col(n))).as(s"_mv_sk_$n") }
    val g = aux.join(keys, Seq(KeyCol), "left_semi")
      .groupBy(col(KeyCol)).agg(aggs.head, aggs.tail: _*)
    spec.kmvs.foldLeft(g) { case (df, (n, _)) =>
      val merged = slice(
        array_sort(array_distinct(col(s"_mv_sk_$n"))), 1, spec.kmvK)
      val ka = size(merged)
      // `when` evaluates branches lazily, so element_at never sees an
      // empty array: ka = 0 < k takes the exact branch
      df.withColumn(n,
          kmvEstimate(spec.kmvK, ka, element_at(merged, ka)))
        .drop(s"_mv_sk_$n")
    }
  }

  /** The view-merge change batch of one refresh: the bucket-pruned
    * current view full-outer-joined with the signed delta (ring columns
    * added groupwise, group columns picked from whichever side has the
    * key), sidecar-maintained columns overwritten from the rollup for
    * affected groups, and the `_mv_op` tombstone derivation. ONE copy —
    * [[refresh]] commits it and [[MvProf]] replays it stage-timed, so
    * the profile can never drift from the real plan. */
  private[lake] def mergedViewChanges(
      current: DataFrame, delta: DataFrame, roll: Option[DataFrame],
      spec: MvSpec, types: Seq[DataType]): DataFrame = {
    val c = current.as("c")
    val d = delta.as("d")
    def pick(name: String): Column =
      when(col(s"c.$KeyCol").isNull, col(s"d.$name"))
        .otherwise(col(s"c.$name")).as(name)
    val zero = lit(0)
    val ringCols =
      spec.effSums.zip(types).map { case ((n, _), t) =>
        (coalesce(col(s"c.$n"), zero.cast(t)) +
          coalesce(col(s"d.$n"), zero.cast(t))).cast(t).as(n)
      } ++
      spec.effSums.map { case (n, _) =>
        (coalesce(col(s"c.${nnName(n)}"), lit(0L)) +
          coalesce(col(s"d.${nnName(n)}"), lit(0L))).as(nnName(n))
      } :+
      (coalesce(col(s"c.${spec.countName}"), lit(0L)) +
        coalesce(col(s"d.${spec.countName}"), lit(0L)))
        .as(spec.countName)
    val mergedCols =
      Seq(coalesce(col(s"c.$KeyCol"), col(s"d.$KeyCol")).as(KeyCol),
        coalesce(col(s"c.$BucketCol"), col(s"d.$BucketCol"))
          .as(BucketCol)) ++
      spec.groupBy.map(pick) ++ ringCols ++
      // sidecar-column placeholders (min/max + kmv): current values
      // carry, affected groups overwritten from the rollup below
      spec.auxNames.map(n => col(s"c.$n").as(n))
    val merged = c.join(d, col(s"c.$KeyCol") === col(s"d.$KeyCol"),
        "full_outer")
      .select(mergedCols: _*)
    val withMM = roll match {
      case None => merged
      case Some(rl) =>
        val r = rl.withColumn("_mv_hit", lit(1)).as("r")
        val mAlias = merged.as("m")
        val keep = merged.columns.filterNot(spec.auxNames.contains)
          .map(n => col(s"m.$n").as(n)).toSeq
        val mm = spec.auxNames.map(n =>
          when(col("r._mv_hit").isNotNull, col(s"r.$n"))
            .otherwise(col(s"m.$n")).as(n))
        mAlias.join(r, col(s"m.$KeyCol") === col(s"r.$KeyCol"), "left")
          .select(keep ++ mm: _*)
    }
    withMM.withColumn("_mv_op",
      when(col(spec.countName) === 0L, lit("d")).otherwise(lit("u")))
  }

  // ---- spec + applied-version sidecar ------------------------------

  private[lake] def writeSideFile(
      spark: SparkSession, root: String, name: String, content: String,
      overwrite: Boolean): Unit = {
    val f = fs(spark, root)
    f.mkdirs(mvMeta(root))
    val fin = new Path(mvMeta(root), name)
    if (overwrite) f.delete(fin, false)
    val tmp = new Path(mvMeta(root),
      s".$name.${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (!Snapshots.publishExclusive(f, tmp, fin))
      throw new java.io.IOException(
        s"materialized-view metadata publish lost a race: $fin " +
          "(concurrent maintainer? the contract is single-maintainer)")
  }

  private[lake] def readSideFile(
      spark: SparkSession, root: String, name: String): Option[String] = {
    val f = fs(spark, root)
    val p = new Path(mvMeta(root), name)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  private def specToText(spec: MvSpec, nBuckets: Int): String =
    (Seq(s"buckets\t$nBuckets",
      ("groupby" +: spec.groupBy).mkString("\t"),
      s"count\t${spec.countName}") ++
      spec.sums.map { case (n, e) => s"sum\t$n\t$e" } ++
      spec.avgs.map { case (n, e) => s"avg\t$n\t$e" } ++
      spec.mins.map { case (n, e) => s"min\t$n\t$e" } ++
      spec.maxs.map { case (n, e) => s"max\t$n\t$e" } ++
      // k rides each kmv line; a kmv-less spec emits NOTHING here so
      // stored specs from before the kmv feature still compare equal
      spec.kmvs.map { case (n, e) => s"kmv\t$n\t$e\t${spec.kmvK}" })
      .mkString("\n")

  /** Base version that view version `v` reflects (None: no marker —
    * either never initialized or a pre-marker crash). */
  private[lake] def appliedAt(
      spark: SparkSession, mvRoot: String, v: Int): Option[Int] =
    readSideFile(spark, mvRoot, f"applied-v$v%08d").map(_.trim.toInt)

  /** Base version the LATEST view version reflects — pass this to the
    * base table's `vacuum(protect = ...)` so the next incremental
    * refresh can still read its retraction side. */
  def appliedBaseVersion(
      spark: SparkSession, mvRoot: String): Option[Int] =
    SnapshotTable.versions(spark, mvRoot).lastOption
      .flatMap(appliedAt(spark, mvRoot, _))

  // ---- lifecycle ---------------------------------------------------

  /** Create the view: full aggregate of the base's LATEST version,
    * committed as view v1. Idempotent: an already-initialized root
    * (with a marker) is left as-is. `nBuckets` fixes the view's
    * key-hash partition count for its lifetime (stored alongside). */
  def init(
      spark: SparkSession, baseRoot: String, mvRoot: String,
      spec: MvSpec, nBuckets: Int = 16): Int = {
    require(nBuckets > 0, "nBuckets must be positive")
    val have = SnapshotTable.versions(spark, mvRoot)
    if (have.nonEmpty && appliedAt(spark, mvRoot, have.last).isDefined)
      return have.last
    require(have.isEmpty,
      s"$mvRoot has committed versions but no applied marker — not a " +
        "MaterializedAgg root (or its _mv sidecar was deleted); " +
        "rebuild under a fresh root")
    writeSideFile(spark, mvRoot, "spec", specToText(spec, nBuckets),
      overwrite = true)
    fullRefresh(spark, baseRoot, mvRoot, spec, nBuckets)
  }

  /** Full recompute against the base's latest version, committed as
    * one new view version (replace-all; the partials sidecar rebuilds
    * replace-all alongside). The fallback when the base was vacuumed
    * below the last-applied version. */
  def fullRefresh(
      spark: SparkSession, baseRoot: String, mvRoot: String,
      spec: MvSpec, nBuckets: Int): Int = {
    val baseV = SnapshotTable.versions(spark, baseRoot).last
    val base = SnapshotTable.read(spark, baseRoot, baseV)
    val (types, mmTypes) = pinTypes(base, spec)
    val sumAggs = spec.effSums.zip(types).map { case ((n, e), t) =>
      sum(expr(e)).cast(t).as(n) }
    val nnAggs = spec.effSums.map { case (n, e) =>
      count(expr(e)).cast(LongType).as(nnName(n)) }
    val mmAggs = (spec.mins.map { case (n, e) => (n, e, true) } ++
      spec.maxs.map { case (n, e) => (n, e, false) })
      .zip(mmTypes).map { case ((n, e, isMin), t) =>
        (if (isMin) min(expr(e)) else max(expr(e))).cast(t).as(n) }
    val aggs = sumAggs ++ nnAggs :+
      count(lit(1)).cast(LongType).as(spec.countName)
    val grouped = base.groupBy(spec.groupBy.map(col): _*)
      .agg((aggs ++ mmAggs).head, (aggs ++ mmAggs).tail: _*)
      .withColumn(KeyCol, keyExpr(spec))
    // KMV estimates join in per group (same window-ranked k-minima
    // build as the sidecar, at group granularity): the full recompute
    // and the incremental rollup reduce to the same "k smallest
    // distinct hashes per group", so they agree exactly
    val full = spec.kmvs.foldLeft(grouped) { case (acc, (n, e)) =>
      val hv = base.select(keyExpr(spec).as(KeyCol), hvExpr(e).as("_mv_hv"))
        .where(col("_mv_hv").isNotNull).distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(KeyCol)).orderBy(col("_mv_hv"))
      val est = hv.withColumn("_mv_rn", row_number().over(w))
        .where(col("_mv_rn") <= spec.kmvK)
        .groupBy(col(KeyCol))
        .agg(count(lit(1)).as("_mv_ka"), max(col("_mv_hv")).as("_mv_kth"))
        .select(col(KeyCol),
          kmvEstimate(spec.kmvK, col("_mv_ka"), col("_mv_kth")).as(n))
      acc.join(est, Seq(KeyCol), "left")
        // a group whose inputs are all NULL has distinct count 0
        .withColumn(n, coalesce(col(n), lit(0.0)))
    }.withColumn(BucketCol, bucketExpr(nBuckets))
    if (spec.auxNames.nonEmpty)
      SnapshotTable.write(spark, auxRoot(mvRoot),
        partialsFrame(base, spec, mmTypes, nBuckets), Seq(ABucketCol))
    val target = SnapshotTable.versions(spark, mvRoot).lastOption
      .getOrElse(0) + 1
    writeSideFile(spark, mvRoot, f"applied-v$target%08d",
      baseV.toString, overwrite = true)
    val v = SnapshotTable.write(spark, mvRoot, full, Seq(BucketCol))
    require(v == target, s"view commit landed at v$v, marker at " +
      s"v$target — concurrent maintainer violates the single-" +
      "maintainer contract")
    v
  }

  /** Incremental refresh: fold every base commit since the last
    * applied version into the view, reading ONLY the changed
    * partitions at both versions (manifest diff) and only the view
    * buckets holding affected keys. No-op (same version returned) when
    * the base has not advanced. Falls back to [[fullRefresh]] when the
    * applied base version was vacuumed away. Returns the view version
    * reflecting the base's latest. */
  def refresh(
      spark: SparkSession, baseRoot: String, mvRoot: String,
      spec: MvSpec, nBuckets: Int = 16): Int = {
    val stored = readSideFile(spark, mvRoot, "spec")
    require(stored.isEmpty || stored.get == specToText(spec, nBuckets),
      s"spec drift under $mvRoot: the view was initialized with a " +
        "different aggregate/bucketing — rebuild under a fresh root " +
        s"(stored:\n${stored.get}\npassed:\n${specToText(spec, nBuckets)})")
    val mvVs = SnapshotTable.versions(spark, mvRoot)
    if (mvVs.isEmpty) return init(spark, baseRoot, mvRoot, spec, nBuckets)
    val m = mvVs.last
    val baseVs = SnapshotTable.versions(spark, baseRoot)
    val latestB = baseVs.last
    val applied = appliedAt(spark, mvRoot, m).getOrElse(
      throw new IllegalStateException(
        s"view $mvRoot@v$m has no applied marker — the _mv sidecar " +
          "is damaged; fullRefresh to re-anchor"))
    if (applied == latestB) return m
    // a marker for a view version that does not exist = a refresh that
    // crashed after publishing its marker, before its commit — discard
    fs(spark, mvRoot).delete(
      new Path(mvMeta(mvRoot), f"applied-v${m + 1}%08d"), false)
    if (!baseVs.contains(applied))
      return fullRefresh(spark, baseRoot, mvRoot, spec, nBuckets)
    // any sidecar-maintained column (min/max OR kmv) needs the
    // zero-delta multiset rule and the rollup overwrite below
    val trackAux = spec.auxNames.nonEmpty

    // 1. changed partition tuples, straight off the two manifests —
    // via the dv-aware diff (round 18): a deletion-vector commit
    // changes rows without changing a directory, and the signed delta
    // below is already correct for it (the old-version read serves the
    // old dv state, the new-version read the new). Each manifest folds
    // ONCE and serves both the entry maps and the diff.
    val mOld = SnapshotTable.manifestAt(spark, baseRoot, applied)
    val mNew = SnapshotTable.manifestAt(spark, baseRoot, latestB)
    val oldMap = mOld.entries.toMap
    val newMap = mNew.entries.toMap
    val changed = SnapshotTable.changedKeysOf(mOld, mNew)
    if (changed.isEmpty) {
      // base advanced with identical data mapping (e.g. an empty
      // upsert minting a version): re-anchor the marker, no commit
      writeSideFile(spark, mvRoot, f"applied-v$m%08d",
        latestB.toString, overwrite = true)
      return m
    }
    val oldKeys = changed.filter(oldMap.contains)
    val newKeys = changed.filter(newMap.contains)

    // 2. signed delta over ONLY the changed tuples' directories.
    // Output types come from the VIEW's own schema (pinned at init) —
    // a base read here would list every base directory just for types.
    val viewSchema = SnapshotTable.read(spark, mvRoot, m).schema
    val types = spec.effSums.map { case (n, _) => viewSchema(n).dataType }
    val mmTypes = spec.mmNames.map(n => viewSchema(n).dataType)
    def changedRows(keys: Set[String], atVersion: Int): Option[DataFrame] =
      if (keys.isEmpty) None
      else Some(SnapshotTable.readPartitionKeys(
        spark, baseRoot, keys, atVersion))
    val added = changedRows(newKeys, latestB).map(aggFrame(_, spec, types, 1))
    val removed = changedRows(oldKeys, applied)
      .map(aggFrame(_, spec, types, -1))
    val signed = (added.toSeq ++ removed.toSeq).reduce(_.unionByName(_))
    val deltaNames = spec.effSums.map(_._1) ++
      spec.effSums.map(n => nnName(n._1)) :+ spec.countName
    val deltaAggs =
      spec.effSums.zip(types).map { case ((n, _), t) =>
        sum(col(n)).cast(t).as(n) } ++
      spec.effSums.map { case (n, _) =>
        sum(col(nnName(n))).cast(LongType).as(nnName(n)) } :+
      sum(col(spec.countName)).cast(LongType).as(spec.countName)
    val deltaAll = signed.groupBy(spec.groupBy.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      .withColumn(KeyCol, keyExpr(spec))
      .withColumn(BucketCol, bucketExpr(nBuckets))
      // barrier: the delta feeds the bucket probe, the sidecar rollup's
      // key set, and the merge — without it each action re-reads the
      // changed directories at both versions
      .cache()
    // Without sidecar columns, groups whose ring deltas are ALL zero
    // (e.g. a compaction's identical rewrite) drop out of the merge
    // entirely. WITH them they must stay: a multiset can change under
    // zero sum/count/nn deltas (drop a 1 and a 3, add a 0 and a 4) and
    // the sidecar re-derivation below — extrema AND distinct sketches —
    // is what catches it.
    val delta =
      if (trackAux) deltaAll
      else deltaAll.filter(deltaNames
        .map(n => coalesce(col(n) =!= lit(0), lit(false)))
        .reduce(_ || _))
    if (!trackAux && delta.isEmpty) {
      // row-preserving rewrites only (OPTIMIZE, re-clustering): the
      // view already equals base@latest — re-anchor without minting a
      // content-identical version
      deltaAll.unpersist(false)
      writeSideFile(spark, mvRoot, f"applied-v$m%08d",
        latestB.toString, overwrite = true)
      return m
    }

    // 3. min/max partials sidecar: dead directories tombstone, the
    // changed tuples' new directories get fresh partials, and affected
    // groups re-derive their extrema from the sidecar alone. Runs
    // BEFORE the marker: idempotent on replay (same tombstones, same
    // values), so a crash anywhere re-converges. Tombstones are "every
    // sidecar row whose directory is not live at latest" — NOT just
    // the applied-version diff's old dirs: a refresh that crashed
    // after its sidecar commit but before its view commit left
    // partials keyed to a directory generation BETWEEN applied and
    // latest, and once the base advances that generation appears in no
    // later diff — diff-only tombstoning would let a deleted extremum
    // resurface forever. The sidecar scan this needs is already paid
    // by the rollup below.
    // Round 20 (guide §2.6 — overlap independent jobs): the sidecar
    // commit and the view-side preparation are independent Spark work —
    // the rollup needs the sidecar's POST-commit content, which is a
    // pure function of frames already in hand (aux0 minus ALL change
    // keys, plus the upsert rows — exactly the merge applyChanges
    // commits), not of the commit having LANDED. So the sidecar commit
    // runs on a background thread while the main thread derives the
    // rollup and builds + materializes the view-merge batch; the view
    // COMMIT still waits for the sidecar commit (await before the
    // marker), so the crash protocol is unchanged: a failure anywhere
    // leaves "sidecar committed, view not" at worst — the documented
    // idempotent-replay window. Warm refresh = max(sidecar commit,
    // view prep) + view commit instead of their sum.
    var auxTask: Option[java.util.concurrent.FutureTask[Int]] = None
    var auxChangesHeld: Option[DataFrame] = None
    val v = try {
    val mmByKey: Option[DataFrame] = if (!trackAux) None else {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val aRoot = auxRoot(mvRoot)
      val aux0 = SnapshotTable.read(spark, aRoot)
      val liveDirs = spark.createDataFrame(
        spark.sparkContext.parallelize(
          newMap.values.toSeq.map(Row(_)), 1),
        StructType(Seq(StructField("_live_dir", StringType))))
      val tombs = aux0.join(broadcast(liveDirs),
          col(DirCol) === col("_live_dir"), "left_anti")
        .withColumn("_mv_op", lit("d"))
      val fresh = changedRows(newKeys, latestB)
        .map(partialsFrame(_, spec, mmTypes, nBuckets)
          .withColumn("_mv_op", lit("u")))
      // cached for the duration: the isEmpty probe, the sidecar
      // commit and the rollup's logical post-commit view would
      // otherwise each re-execute the tombstone anti-join +
      // fresh-partials build (round-19; applyChanges sees the cache
      // and skips its own). Released after the commit await below.
      val auxChanges = (fresh.toSeq :+ tombs).reduce(_.unionByName(_))
        .cache()
      auxChangesHeld = Some(auxChanges)
      // the emptiness probe rides the background thread too: the main
      // thread never needs its answer, and running it here would be
      // one more serial action before any overlap starts
      val task = new java.util.concurrent.FutureTask[Int](() =>
        if (auxChanges.isEmpty) SnapshotTable.versions(spark, aRoot).last
        else SnapshotTable.applyChanges(spark, aRoot, auxChanges,
          key = AKeyCol, partitionBy = Seq(ABucketCol),
          opCol = "_mv_op"))
      val th = new Thread(task, "graft-mv-aux-commit")
      th.setDaemon(true)
      th.start()
      auxTask = Some(task)
      // LOGICAL post-commit sidecar for the rollup — value-identical
      // to re-reading the committed table (applyChanges' merge is:
      // every change key leaves the live set, upsert rows come back;
      // aux0's file list is pinned at plan time, and directories are
      // immutable, so the concurrent commit cannot disturb this read)
      val upserts = auxChanges.filter(col("_mv_op") =!= "d")
        .drop("_mv_op")
        .select(aux0.columns.map(col).toSeq: _*)
      val auxAfter = aux0.join(
          auxChanges.select(col(AKeyCol).as("_mv_gk")),
          col(AKeyCol) === col("_mv_gk"), "left_anti")
        .unionByName(upserts)
      Some(rollup(auxAfter, spec, deltaAll.select(col(KeyCol))))
    }

    // 4. merge into the view: only buckets holding affected keys
    val buckets = delta.select(col(BucketCol)).distinct()
      .collect().map(_.getLong(0).toString).toSeq // <= nBuckets values
    val current =
      if (buckets.isEmpty)
        SnapshotTable.read(spark, mvRoot, m).limit(0)
      else SnapshotTable.readPartitions(
        spark, mvRoot, buckets.map(Seq(_)), m)
    // cached for the duration (round 19): the view commit executes the
    // batch twice (one-pass validation probe + staging write), and the
    // batch is a multi-join over the bucket reads, the cached delta and
    // the sidecar rollup. Bounded by construction — affected view
    // buckets × groups plus the rollup's group rows, dimension-sized —
    // so holding it is safe where a generic applyChanges batch is not
    // (which is why the caching lives HERE, not inside applyChanges).
    val viewChanges = mergedViewChanges(current, delta, mmByKey, spec,
      types).cache()
    try {
    // 5. the view commit's Spark work (validation probe + staging
    // write) runs NOW, overlapping the background sidecar commit; the
    // publish gate below holds only the manifest RENAME until the
    // sidecar has landed and the applied marker exists — the same
    // ordering as before (aux commit → marker → view publication),
    // with the expensive stages concurrent instead of serial. The
    // marker write is once-only so a conflict-retried attempt (which
    // re-runs the gate) stays create-exclusive-clean.
    val markerDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotTable.applyChanges(spark, mvRoot, viewChanges,
      key = KeyCol, partitionBy = Seq(BucketCol), opCol = "_mv_op",
      publishGate = () => {
        auxTask.foreach(_.get()) // surfaces a sidecar failure pre-marker
        if (markerDone.compareAndSet(false, true))
          writeSideFile(spark, mvRoot, f"applied-v${m + 1}%08d",
            latestB.toString, overwrite = false)
      })
    } finally viewChanges.unpersist(false)
    // the try covers steps 3-5: a failure ANYWHERE after the cache
    // (sidecar commit, rollup, marker, view commit) must still release
    // the cached delta — a long-lived CDC maintainer would otherwise
    // pin one dataset per failed refresh
    } finally {
      // single-maintainer hygiene: never return (or rethrow) with the
      // background commit still in flight — a caller's retry would
      // otherwise race it. Its own failure is surfaced by the get()
      // above on the success path; here it only needs to be DONE.
      auxTask.foreach(t =>
        try { t.get(); () } catch { case _: Throwable => () })
      auxChangesHeld.foreach(_.unpersist(false))
      deltaAll.unpersist(false)
    }
    require(v == m + 1, s"view commit landed at v$v, marker at " +
      s"v${m + 1} — concurrent maintainer violates the single-" +
      "maintainer contract")
    v
  }

  /** Retention for the view AND its partials sidecar: old view
    * versions serve only time travel (refresh reads latest + markers),
    * so both tables vacuum to `keepVersions`. The BASE table's vacuum
    * is the caller's (protect [[appliedBaseVersion]] there — see
    * [[graft.streaming.CdcStream.TableMaintenance]]). */
  def vacuum(
      spark: SparkSession, mvRoot: String, keepVersions: Int): (Int, Int) = {
    val (d1, f1) = SnapshotTable.vacuum(spark, mvRoot, keepVersions)
    val aRoot = auxRoot(mvRoot)
    val (d2, f2) =
      if (SnapshotTable.versions(spark, aRoot).nonEmpty)
        SnapshotTable.vacuum(spark, aRoot, keepVersions)
      else (0, 0)
    (d1 + d2, f1 + f2)
  }

  /** The view as a user-facing frame: group columns, sums (NULL when
    * the group has no non-null inputs — SQL semantics, not 0), derived
    * AVGs, MIN/MAX, count; internal key/bucket/non-null-count columns
    * dropped. `version` as in [[SnapshotTable.read]]. */
  def read(
      spark: SparkSession, mvRoot: String, version: Int = -1): DataFrame = {
    val raw = SnapshotTable.read(spark, mvRoot, version)
    val names = raw.schema.fieldNames.toSeq
    val out: Seq[Column] = names.flatMap {
      case KeyCol | BucketCol => None
      case n if n.startsWith("_mv_nn_") => None
      case n if n.startsWith("_mv_avg_") =>
        val a = n.stripPrefix("_mv_avg_")
        Some(when(col(nnName(n)) === 0L, lit(null))
          .otherwise(col(n) / col(nnName(n))).as(a))
      case n if names.contains(nnName(n)) =>
        Some(when(col(nnName(n)) === 0L,
            lit(null).cast(raw.schema(n).dataType))
          .otherwise(col(n)).as(n))
      case n => Some(col(n))
    }
    raw.select(out: _*)
  }
}
