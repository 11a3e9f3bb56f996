package graft

import graft.queries.Registry
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchAndSqlTwinSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.01"

  test("exact sum-of-squares survives past long-accumulator overflow") {
    import spark.implicits._
    import graft.functions.ExactNum
    // 5 rows of 4e9: Σx² = 8e19 > Long.MaxValue (9.2e18) — a long
    // accumulator wraps (or errors under ANSI); the decimal path and
    // its two-word decomposition must stay exact.
    val d = 4_000_000_000L
    val rows = Seq.fill(5)(d).toDF("d")
    val got = rows.agg(
      ExactNum.hiWord(ExactNum.sumSq(col("d"))).as("hi"),
      ExactNum.loWord(ExactNum.sumSq(col("d"))).as("lo"))
      .collect().head
    val want = BigInt(d) * BigInt(d) * 5
    assert(BigInt(got.getLong(0)) * BigInt(2147483648L) + BigInt(got.getLong(1)) === want)
    // remainder-before-divide guard: a value within 5e-7 of the next
    // 2^31 multiple must not round its hi word up
    val edge = Seq(2147483647L).toDF("x") // x² = (2^31-1)² = hi (2^31-2), lo 1
    val e = edge.agg(
      ExactNum.hiWord(ExactNum.sumSq(col("x"))).as("hi"),
      ExactNum.loWord(ExactNum.sumSq(col("x"))).as("lo"))
      .collect().head
    assert(e.getLong(0) === 2147483646L && e.getLong(1) === 1L)
  }

  test("q21 sketches are within tolerance of exact values") {
    // the in-band flags ARE the tolerance check, computed in-plan so the
    // driver's hash compare enforces them; here additionally cross-check
    // the exact columns against an independent computation
    val rows = Registry.queries("q21_sketches")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4))).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"),
           expr("percentile(cast(round(l_extendedprice * 100) as long), 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (n, m)) =>
      val (qn, qm, hllOk, pctlOk) = rows(flag)
      assert(qn === n, s"$flag exact distinct mismatch")
      assert(qm === m, s"$flag exact median mismatch")
      assert(hllOk === 1, s"$flag HLL estimate out of 5% band")
      assert(pctlOk === 1, s"$flag percentile estimate out of 5% band")
    }
  }

  test("q28 KMV sketch: near exact counts, partition-invariant, exact under k") {
    import spark.implicits._
    // accuracy: within 5% of exact per group at k=256
    val kmvByFlag = Registry.queries("q28_kmv_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag")).agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, n) =>
      assert(math.abs(kmvByFlag(flag) - n) / n < 0.05, s"$flag: ${kmvByFlag(flag)} vs $n")
    }
    // determinism: the estimate is a pure function of the hash set, so
    // any partitioning (merge order) yields the identical double
    val kmv = udaf(new graft.operators.KmvDistinct(64))
    def est(parts: Int): Double = spark.range(10000)
      .select(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
        .cast("long").as("v"))
      .repartition(parts)
      .agg(kmv(col("v"))).head().getDouble(0)
    assert(est(1) === est(13))
    // under k distinct values the sketch IS the distinct set (exact),
    // duplicates and all
    val small = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("v").agg(kmv(col("v")))
    assert(small.head().getDouble(0) === 3.0)
  }

  test("SQL-text twins over registered temp views match the DSL results") {
    Tables.registerAll(spark, sfDir)
    val sqlHist = spark.sql(
      "SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority").collect().toSeq
    val dslHist = Registry.queries("q03_priority_histogram")(spark, sfDir)
      .collect().toSeq
    assert(sqlHist === dslHist)

    val sqlJoin = spark.sql(
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)
      .collect().toSeq
    val dslJoin = Registry.queries("q04_nation_revenue")(spark, sfDir)
      .collect().toSeq
    assert(sqlJoin === dslJoin)
  }
}
