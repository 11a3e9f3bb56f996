package graft

import graft.operators.LmScore
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "zyx qwv jkl pfft xqz nnm"))  // rare-token gibberish
    .toDF("doc_id", "text")

  test("unigram costs: common tokens cheap, hapaxes expensive, exact micro-nats") {
    val costs = LmScore.unigramCosts(docs, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(costs("the")._1 === 4L)
    assert(costs("zyx")._1 === 1L)
    // 18 tokens total: cost(the) = round(ln(18/4)*1e6), cost(zyx) = round(ln(18)*1e6)
    assert(costs("the")._2 === math.round(math.log(18.0 / 4.0) * 1e6))
    assert(costs("zyx")._2 === math.round(math.log(18.0) * 1e6))
    assert(costs("the")._2 < costs("zyx")._2)
  }

  test("gibberish scores strictly worse than natural repetition") {
    val scores = LmScore.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scores(3L) > scores(1L) && scores(3L) > scores(2L))
    // doc 3 is all hapaxes: avg cost = ln(18) exactly
    assert(math.abs(scores(3L) - math.log(18.0)) < 1e-3)
  }

  test("score is partition-invariant (integer micro-nat sums)") {
    val a = LmScore.score(docs.repartition(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = LmScore.score(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a === b)
  }
}
