package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Deterministic hash-sampling primitives shared by the split/sampler
  * operators (t10, t16) and the curation funnel's rebalance stage —
  * ONE copy of the md5-bucket formula and the stratified accept test so
  * a change to the hashing scheme cannot silently diverge between the
  * benchmarked operators and the pipeline that claims to apply them.
  *
  * Membership is a pure function of the stable key (never of
  * partitioning, row order, or engine RNG), so every run and every
  * engine assigns each row identically — the property training
  * pipelines need for leak-free splits and reproducible sampling.
  * DuckDB-oracle mirror of [[md5Bucket]]:
  * `CAST(concat('0x', substr(md5(<key>), 1, 15)) AS BIGINT) % <mod>`.
  */
object Sampling {
  /** SQL expression string: bucket in [0, mod) from the md5 of the
    * (optionally salted) key expression. The salt decorrelates two
    * decisions taken on the same key — e.g. Curate's mix-rebalance
    * accept ('mix:' salt) vs its train/valid/test split (unsalted):
    * unsalted, the two would read correlated ranges of one hash. */
  def md5Bucket(keySql: String, mod: Long, salt: String = ""): String = {
    // The salt lands inside a SQL string literal; restrict it to a safe
    // alphabet so a quote (or any metacharacter) can never break out of
    // the literal and alter the generated expression — public API.
    require(salt.matches("[A-Za-z0-9_.:-]*"),
      s"salt must match [A-Za-z0-9_.:-]*, got: $salt")
    val arg = if (salt.isEmpty) keySql else s"concat('$salt', $keySql)"
    s"pmod(CAST(conv(substr(md5($arg), 1, 15), 16, 10) AS BIGINT), ${mod}L)"
  }

  /** Stratified accept test: keep iff bucket/mod < minN/n, compared as
    * the EXACT rational `bucket * n < minN * mod` (no float rate). The
    * stratum with n == minN keeps every row (bucket < mod always). */
  def stratifiedAccept(bucket: Column, n: Column, minN: Column, mod: Long): Column =
    bucket * n < minN * lit(mod)
}
