package graft

import graft.operators.Components
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ComponentsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] =
    Components.connectedComponents(
        edges.toDF("a", "b").repartition(parts), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two disjoint cliques get their min-id representatives") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a chain converges across multiple propagation rounds") {
    // path 9-8-7-6-5-4-3-2-1: min label 1 must travel 8 hops
    val edges = (1L to 8L).map(i => (i + 1, i))
    val got = cc(edges)
    assert(got === (1L to 9L).map(_ -> 1L).toMap)
  }

  test("edge direction and duplicates don't matter") {
    val got = cc(Seq((5L, 2L), (2L, 5L), (5L, 2L), (7L, 5L)))
    assert(got === Map(2L -> 2L, 5L -> 2L, 7L -> 2L))
  }

  test("result is partition-invariant") {
    val edges = Seq((1L, 2L), (3L, 2L), (9L, 4L), (4L, 8L), (6L, 7L))
    assert(cc(edges, parts = 1) === cc(edges, parts = 7))
  }

  test("an empty edge list yields an empty result, not a crash") {
    assert(cc(Seq.empty[(Long, Long)]) === Map.empty[Long, Long])
  }

  test("non-convergence within maxIter fails loudly") {
    val edges = (1L to 8L).map(i => (i + 1, i))
    val ex = intercept[IllegalArgumentException] {
      Components.connectedComponents(
        edges.toDF("a", "b"), "a", "b", maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
