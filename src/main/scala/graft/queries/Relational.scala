package graft.queries

import graft.functions.ExactNum.{cents, e4}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational query surface: the reference's 7 canonical README queries
  * (SURVEY.md §3.2 — top-k, multi-way joins, group-by aggregates,
  * GROUP_CONCAT, HAVING, conditional aggregation) re-expressed over the
  * driver's TPC-H-ish tables, plus the operator classes of SURVEY.md §2
  * (filters P1-P10, joins J1-J5, aggregations A1-A9, sorts/limits O1-O6).
  *
  * Every query is lazy DataFrame DSL — Catalyst does pushdown, pruning,
  * join selection (broadcast for the dims), partial aggregation, and
  * top-k fusion (TakeOrderedAndProject). No UDFs: everything stays in
  * whole-stage codegen.
  */
object Relational {

  /** A4/A8-class grouped aggregation over the fact table (shape of
    * reference Q3/Q6: count + sums per group; `README.md:561-572`).
    * Partial (map-side) aggregation halves the shuffle; exact integer
    * cents keep the result bit-stable at any partition count.
    */
  private def q01(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") < lit("2001-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(e4(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_e4"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '2001-01-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** O1-class top-k (reference Q1 `README.md:530-541`): ORDER BY ... LIMIT
    * fuses into TakeOrderedAndProject — per-partition top-k then a k-row
    * driver merge; no global sort at any scale. o_orderkey tiebreak makes
    * the result total-ordered.
    */
  private def q02(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"))

  private val q02Sql =
    """SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_cents
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** A9-class frequency histogram (reference Q7 rating distribution,
    * `README.md:684-688`): group → count → order. Two-phase hash
    * aggregate; only 5 groups cross the shuffle.
    */
  private def q03(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  private val q03Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q01_pricing_summary", q01, Some(q01Sql)),
    QuerySpec("q02_topk_orders", q02, Some(q02Sql)),
    QuerySpec("q03_priority_histogram", q03, Some(q03Sql)))
}
