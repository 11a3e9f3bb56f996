package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact numeric helpers.
  *
  * Money columns in the test tables are doubles carrying 2 decimal digits
  * (prices) or 4 (price * (1 - discount)). Doubles cannot represent those
  * exactly, and a floating sum is order-dependent — at 100 TB the shuffle
  * partitioning (or another engine's aggregation order) changes the last
  * bits, which breaks hash-comparison and makes results nondeterministic
  * run to run. Scaling to an exact integer *before* the sum makes the
  * aggregate exact and associative: identical in Spark and DuckDB
  * regardless of plan, partition count, or reduction order, and it keeps
  * the aggregation in whole-stage codegen (pure built-ins, no UDF).
  *
  * Long overflow headroom: cents of a 1e4-magnitude price is ~1e6 per
  * row; 2^63 ≈ 9.2e18 allows ~9e12 rows per group before overflow — safe
  * at 100 TB scale.
  */
object ExactNum {
  /** price → exact integer cents (2 implied decimals). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** 4-implied-decimal fixed point (e.g. price * (1 - discount)). */
  def e4(c: Column): Column = round(c * 10000, 0).cast("long")

  /** Exact Σx² aggregate for integer inputs, accumulated as
    * DECIMAL(38,0). A long accumulator overflows at ~3e7 rows per group
    * for 5e5-magnitude values — far below 100 TB group sizes — so the
    * square is computed in decimal (inputs up to 18 digits, no per-row
    * overflow) and summed exactly: decimal sums are associative,
    * partial-aggregate-friendly, and 38 digits keep ~1e15 headroom over
    * a 100 TB corpus's worst-case ~1e23 total. Overflow past 38 digits
    * errors under ANSI mode rather than wrapping silently. */
  def sumSq(c: Column): Column = {
    val d = c.cast("decimal(18,0)")
    sum((d * d).cast("decimal(38,0)"))
  }

  private val wordBase = lit(2147483648L) // 2^31

  /** Decompose a non-negative decimal accumulator into two portable
    * BIGINT words (value = hi·2³¹ + lo) for engines/consumers whose
    * widest exact integer is 64-bit. hi is computed as the exact
    * integer quotient (subtract the remainder BEFORE dividing — decimal
    * division rounds to a fixed scale, so flooring a rounded quotient
    * could misassign values within 5e-7 of the next integer). */
  def hiWord(s: Column): Column = ((s - s % wordBase) / wordBase).cast("long")

  /** Low word of [[hiWord]]'s decomposition: value mod 2³¹. */
  def loWord(s: Column): Column = (s % wordBase).cast("long")

  /** Exact half-up rounding of the rational p/q (non-negative integer
    * Columns) to 4 decimals, emitted as the display double. Why not
    * `round(p/q, 4)`: a true value landing exactly on a half-boundary
    * (e.g. 0.37975) rounds differently per engine — Spark rounds the
    * double's shortest DECIMAL representation via BigDecimal HALF_UP,
    * DuckDB rounds the scaled DOUBLE, and the two disagree whenever
    * the nearest double sits on the other side of the half. Integer
    * form: floor((2·p·10⁴ + q) / 2q), then one exact /10⁴ division —
    * no double is ever rounded. DuckDB mirror:
    * `CAST((p * 20000 + q) // (q * 2) AS DOUBLE) / 10000.0`.
    * Overflow bound: p must stay below 2^63/2·10⁴ ≈ 4.6e14. */
  def roundRatio4(p: Column, q: Column): Column =
    call_function("div", p * lit(20000L) + q, q * lit(2L))
      .cast("double") / 1e4
}
