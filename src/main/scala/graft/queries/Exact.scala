package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic floating-point aggregates.
  *
  * Plain `sum(double)` is order-dependent (FP addition is not associative),
  * so a distributed Spark sum and a single-threaded DuckDB oracle sum can
  * differ in the last ulp and fail a hash compare. Summing through a wide
  * decimal is exact and therefore order-independent; the final cast back to
  * double is a single well-defined rounding. Both engines implement the
  * identical semantics, so results are bit-equal.
  *
  * At 100 TB this costs one decimal accumulation per row — still map-side
  * partial-aggregated by Catalyst (HashAggregate partial/final), no extra
  * shuffle.
  */
object Exact {

  /** Order-independent sum of a double column via DECIMAL(38, scale).
    *
    * NOTE the semantics: each input is first QUANTIZED to `scale` decimal
    * places (half-up), then summed exactly in decimal, then the total is
    * rounded once back to double. This is not "the exact sum of the
    * doubles" — inputs with more than `scale` fractional digits are
    * rounded before summing. The default scale=4 fits the TPC-H-style
    * money/quantity columns here (at most 2–4 fractional digits, so
    * quantization is the identity); callers aggregating higher-precision
    * columns must pick a scale that covers their precision, at the cost
    * of fewer integral digits (38 − scale).
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  /** Deterministic average: exact decimal sum, then one double division. */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** Matching DuckDB/ANSI SQL fragment for [[dsum]].
    *
    * The final decimal→double cast goes through VARCHAR: DuckDB's direct
    * `DECIMAL(38,s) → DOUBLE` cast divides two separately-rounded doubles
    * (int128 numerator, 10^s) and is therefore not always correctly
    * rounded, while Spark's `Decimal.toDouble` (BigDecimal.doubleValue)
    * is. The string round-trip forces DuckDB through its correctly-
    * rounded strtod, making both engines produce the identical last ulp
    * (observed: q1/q18 at sf0.1 differ by exactly one ulp without this).
    */
  def dsumSql(col: String, scale: Int = 4): String =
    s"CAST(CAST(SUM(CAST($col AS DECIMAL(38,$scale))) AS VARCHAR) AS DOUBLE)"

  /** Matching DuckDB/ANSI SQL fragment for [[davg]]. */
  def davgSql(col: String, scale: Int = 4): String =
    s"${dsumSql(col, scale)} / COUNT($col)"
}
