package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirror of the driver's t1 smoke: entry() on sf0.001 returns rows. */
class EntrySmokeSpec extends AnyFunSuite with SparkTestSession {
  test("entry() produces rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(SparkEntry.queries.nonEmpty)
    // every oracle key corresponds to a registered query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
