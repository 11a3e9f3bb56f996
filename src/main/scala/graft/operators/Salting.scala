package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew mitigation for shuffle joins (SURVEY.md §4.3 / builder
  * prompt). AQE's skew-join handles sort-merge skew at runtime; salting
  * is the plan-level tool when one side has pathological hot keys (a
  * handful of keys holding a large fraction of rows — the classic
  * power-law fact table).
  *
  * Mechanics: the skewed side gets a per-row salt in [0, S); the small
  * side is replicated S ways; the join key becomes (key, salt), which
  * splits each hot key's rows across S reducers. Join RESULTS are
  * identical to the unsalted join (verified by SaltingSpec); only the
  * partitioning changes — every possible salt value has a replica on
  * the small side, so the per-row salt choice affects placement, never
  * membership.
  */
object Salting {

  /** Inner equi-join with the left (large/skewed) side salted S ways. */
  def saltedJoin(large: DataFrame, small: DataFrame,
                 key: String, salt: Int): DataFrame = {
    val saltedLarge = large.withColumn(
      "__salt", pmod(hash(monotonically_increasing_id()), lit(salt)))
    val repeatedSmall = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(repeatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
