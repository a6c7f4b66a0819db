package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent ("exact") aggregation helpers.
  *
  * Summing IEEE doubles is not associative, so a distributed Spark sum
  * (partial aggregates per partition, merge order nondeterministic) will
  * generally NOT bit-match a single-threaded oracle, and won't even match
  * itself across runs with different partitioning. At cluster scale this
  * makes results non-reproducible. The fix is classic: aggregate in exact
  * decimal arithmetic (associative + commutative), then cast the final
  * scalar back to double. The cast double->decimal(18,6) rounds to nearest,
  * which is deterministic and engine-independent (binary doubles never land
  * exactly on a decimal rounding midpoint at scale 6 for these data ranges).
  *
  * DuckDB-oracle mirror: `CAST(x AS DECIMAL(18,6))`, `SUM(...)`, then
  * `CAST(... AS DOUBLE)`.
  */
object Exact {
  val D: DecimalType = DecimalType(18, 6)

  /** Exact-decimal view of a double column. */
  def dec(c: Column): Column = c.cast(D)

  /** Reduce a decimal aggregate to scale 4 before the final double cast.
    * Inputs are 2-decimal money values, so scale-12 product sums carry at
    * most 4 nonzero decimals: the scale-4 cast is exact (no rounding-mode
    * dependence — Spark HALF_UP vs DuckDB HALF_EVEN differ on .xx5 ties).
    * Keeping the unscaled value < 2^53 makes decimal->double a single
    * correctly-rounded step on every engine (DuckDB casts int128/10^s via
    * double division, which double-rounds when the unscaled part exceeds
    * 2^53 — observed on scale-12 product sums). */
  def money(c: Column): Column = c.cast(DecimalType(30, 4)).cast("double")

  /** Order-independent sum of a double column, returned as double. */
  def sumd(c: Column): Column = sum(dec(c)).cast("double")

  // ---- integer-cents fast path -------------------------------------
  // Money columns are exact 2-decimal values (verified: every price/
  // discount/tax/balance lands within 4e-9 of integer cents, pure float
  // representation error). round() collapses that error, after which the
  // whole aggregate runs in LONG arithmetic — the same exact value as the
  // decimal ladder at ~25x less per-row cost, because Spark's
  // Decimal(18,6) multiply falls off the compact-long representation into
  // BigDecimal in the aggregation hot loop.

  /** Money column as exact integer cents (LongType). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** `price * (1 - discount)` at scale 1e4, exact, as a long.
    * Per-row bound ~1.1e9, so a LONG group sum stays exact below ~8e9
    * rows per group — safe for high-cardinality grains (per part / order /
    * customer) at any scale factor. For low-cardinality grains (nation,
    * global) that can exceed it at 100 TB, sum [[e4big]] instead. */
  def revenueE4(price: Column, disc: Column): Column =
    cents(price) * (lit(100L) - cents(disc))

  /** Overflow-proof accumulator view of an e4-scaled long (the multiply
    * stays in long; only the sum pays the decimal add). */
  def e4big(c: Column): Column = c.cast(DecimalType(38, 0))

  /** e4-scaled sum back to a money double: one exact long/decimal → double
    * cast (correctly rounded on every engine) and one IEEE division. */
  def moneyE4(sumE4: Column): Column = sumE4.cast("double") / lit(10000.0)

  /** Order-independent mean: exact sum divided by count, one IEEE division
    * of identical operands on any engine. */
  def avgd(c: Column): Column =
    (sum(dec(c)).cast("double") / count(c)).cast("double")

  // ---- exact-integer log2 (Mitchell) --------------------------------
  // libm log2 differs across engines in the last ulp, so a transcendental
  // inside a hash-matched operator would be a rare nondeterministic flake.
  // Mitchell's log-linear approximation runs in EXACT 64-bit integer
  // arithmetic instead: k = floor(log2(num/den)) from the bit length of
  // num div den, fractional part by linear interpolation of the remainder.
  // Monotone in num/den (rank-preserving, all a quality filter consumes),
  // max error 0.086 bits, bit-identical on every engine.

  /** SQL expression string: Mitchell log2(num/den) in nano-bits
    * (k·1e9 + frac·1e9) as BIGINT. `num`/`den` must be BIGINT-typed SQL
    * expressions with num >= den >= 1 (they may reference lambda
    * variables, so this is a string, not a Column). ONE copy shared by
    * t13 (surprisal), t14 (IDF) and mm05 (entropy) — a precision change
    * here lands in every consumer at once; the DuckDB oracles
    * hand-mirror this text with `//` and `<<`. */
  def mitchellLog2n9(num: String, den: String): String = {
    val k = s"(length(bin(($num) div ($den))) - 1)"
    val p = s"(($den) * shiftleft(CAST(1 AS BIGINT), $k))"
    s"(CAST($k AS BIGINT) * 1000000000 + (($num) - $p) * 1000000000 div $p)"
  }

  /** Wide-fraction variant of [[mitchellLog2n9]] for arguments that are
    * PRODUCTS of counts (t20's c_st*n vs c_t*n_s). `k` still computes in
    * long arithmetic — num and den must fit int64 — but the fractional
    * step's `(num - p) * 1e9` multiply runs in DECIMAL(38,0): the long
    * path overflows that step once p exceeds ~9.2e9, which count
    * PRODUCTS reach at ~1e7-token corpora even though plain counts
    * (t13/t14/mm05's inputs) only get there past ~9.2e9 tokens. Same
    * nano-bit long result where both paths are in range. DuckDB mirror:
    * HUGEINT multiply, then `//`. */
  def mitchellLog2n9Wide(num: String, den: String): String = {
    val k = s"(length(bin(($num) div ($den))) - 1)"
    val p = s"(($den) * shiftleft(CAST(1 AS BIGINT), $k))"
    s"""(CAST($k AS BIGINT) * 1000000000 +
        CAST(CAST((($num) - $p) AS DECIMAL(38,0)) * 1000000000 div $p
             AS BIGINT))"""
  }
}
