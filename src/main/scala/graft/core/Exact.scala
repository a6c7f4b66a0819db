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

  /** Order-independent mean: exact sum divided by count, one IEEE division
    * of identical operands on any engine. */
  def avgd(c: Column): Column =
    (sum(dec(c)).cast("double") / count(c)).cast("double")
}
