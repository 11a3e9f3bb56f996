package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: within each key, consecutive events whose
  * time gap exceeds `gap` start a new session — the lag-then-running-sum
  * window composition (batch twin of Structured Streaming's
  * session_window, which `streaming.EventsStreaming` covers).
  *
  * The time column must be an integral type (e.g. epoch micros): the
  * gap comparison is then exact and engine-portable — no
  * timestamp-precision coin flips at the session boundary.
  *
  * Scale shape: both windows partition by the key, so sessions
  * parallelize across keys and no global window funnels the event log
  * through one task; `tieCol` (a unique id) makes the within-key order
  * total, so the assignment is deterministic at any partitioning.
  * Boundary semantics: strictly-greater — a gap of exactly `gap` units
  * stays in the session.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per-key session ordinal) to `df`. */
  def assign(df: DataFrame, keyCol: Column, tsCol: Column, tieCol: Column,
             gap: Long): DataFrame = {
    require(gap >= 0, s"gap must be non-negative, got $gap")
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    df.withColumn("__new",
        when(lag(tsCol, 1).over(w).isNull
          || tsCol - lag(tsCol, 1).over(w) > gap, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }
}
