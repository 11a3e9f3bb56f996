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

  // ---------------- DSIR importance weights (round-15) ----------------

  private val dsirDocs = Seq(
    // target domain: legal boilerplate sharing distinctive vocabulary
    (1L, "whereas the party hereby agrees to the terms", "legal"),
    (2L, "the party shall hereby indemnify the other party", "legal"),
    // raw pool: one legal-sounding doc and two off-domain docs
    (3L, "the court hereby finds the party liable", "crawl"),
    (4L, "cats and dogs play in the park", "crawl"),
    (5L, "stir the soup and add more salt", "crawl"))
    .toDF("doc_id", "text", "source")

  test("dsir costs: target-loved tokens get positive log-ratio, smoothing is exact") {
    import org.apache.spark.sql.functions.col
    val costs = LmScore.dsirCosts(dsirDocs, "text", col("source") === "legal")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // 'hereby': 2 target occurrences of 16 target tokens, 3 raw of 37
    val (tt, tr, v) = (16L, 37L, costs.size.toLong)
    assert(costs("hereby")._1 === 2L && costs("hereby")._2 === 3L)
    assert(costs("hereby")._3 ===
      math.round(math.log(3.0 / (tt + v)) * 1e6))
    assert(costs("hereby")._4 ===
      math.round(math.log(4.0 / (tr + v)) * 1e6))
    // target-unseen token: smoothed, finite, strongly negative ratio
    val salt = costs("salt")
    assert(salt._1 === 0L && salt._3 === math.round(math.log(1.0 / (tt + v)) * 1e6))
    assert(costs("hereby")._3 - costs("hereby")._4 > 0L) // loved by target
    assert(salt._3 - salt._4 < 0L)                       // unseen by target
  }

  test("dsir selection: domain-like docs outrank off-domain, top-k flag exact") {
    import org.apache.spark.sql.functions.col
    val rows = LmScore.dsirSelect(dsirDocs, "doc_id", "text",
        col("source") === "legal", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    // the legal-sounding crawl doc (3) must outweigh both off-domain
    // docs — that's the whole point of importance weighting
    assert(rows(3L)._1 > rows(4L)._1 && rows(3L)._1 > rows(5L)._1)
    // top-3 by (weight desc, doc_id): the two target docs + doc 3
    assert(rows.collect { case (id, (_, 1)) => id }.toSet === Set(1L, 2L, 3L))
    // weights are integer micro-nats: partition-invariant
    val again = LmScore.dsirWeights(dsirDocs.repartition(7), "doc_id", "text",
        col("source") === "legal")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again === rows.map { case (id, (w, _)) => id -> w })
  }
}
