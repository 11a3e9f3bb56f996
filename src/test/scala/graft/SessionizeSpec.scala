package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def sessions(rows: Seq[(Long, Long, Long)], gap: Long,
                       parts: Int = 4): Map[Long, Long] =
    Sessionize.assign(
        rows.toDF("user", "ts", "id").repartition(parts),
        col("user"), col("ts"), col("id"), gap)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap

  test("gap strictly greater than threshold starts a new session") {
    // ids 1,2 10 apart (= gap, same session); id 3 is 11 past id 2 (new)
    val got = sessions(Seq((7L, 100L, 1L), (7L, 110L, 2L), (7L, 121L, 3L)), gap = 10)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("sessions are per-key: different users never merge") {
    val got = sessions(Seq((1L, 100L, 1L), (2L, 101L, 2L), (1L, 102L, 3L)), gap = 10)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("equal timestamps share a session and tie-break deterministically") {
    val rows = Seq((5L, 100L, 2L), (5L, 100L, 1L), (5L, 200L, 3L))
    assert(sessions(rows, gap = 50, parts = 1) ===
      sessions(rows, gap = 50, parts = 7))
    assert(sessions(rows, gap = 50) === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
