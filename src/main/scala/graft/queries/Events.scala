package graft.queries

import graft.functions.ExactNum.cents
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch queries over the `events` stream table (TESTDATA.md). The
  * tumbling-window aggregate here is the batch twin of the Structured
  * Streaming pipeline in graft.streaming — same grouping semantics, so
  * the oracle check covers the streaming aggregation logic too.
  *
  * Note on time: events carry nanosecond timestamps; Spark truncates to
  * microseconds on read. Outputs only expose hour-truncated buckets, so
  * the sub-microsecond difference can never reach the compare.
  */
object Events {

  /** Tumbling 1-hour window aggregation (streaming A4-class): count +
    * exact value cents per (hour, event_type). At scale this is one
    * shuffle on (hour, type) after map-side partial aggregation.
    */
  private def q16(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))
      .orderBy(col("hour"), col("event_type"))

  private val q16Sql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** F9-class JSON field access (reference API-response projection,
    * etl1.py:160-167): pull `k` out of the props JSON and aggregate.
    * get_json_object is codegen'd — no UDF, no full JSON parse per field
    * at scale (single-path extraction).
    */
  private def q17(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).as("k_sum"),
        count(col("k")).as("k_present"))
      .orderBy(col("event_type"))

  private val q17Sql =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_present
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q16_events_hourly", q16, Some(q16Sql)),
    QuerySpec("q17_json_props", q17, Some(q17Sql)))
}
