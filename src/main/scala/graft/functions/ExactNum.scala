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
}
