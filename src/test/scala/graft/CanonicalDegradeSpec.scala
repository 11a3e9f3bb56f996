package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degrade-don't-fail sweep for the canonical layer (round-19, VERDICT
  * item 7): the reference's MovieLens feed carries structurally
  * degraded rows — 13 titles with no parseable year, a
  * "(no genres listed)" genre sentinel, movies with an empty links /
  * ratings record, 'N/A' and NULL directors, NULL ratings
  * (SURVEY.md §1.4) — and `etl1.py` DEGRADES on them (nulls flow
  * through, sentinels filter like any value) rather than failing.
  * This spec builds a TPC-H-shaped gate fixture variant carrying
  * exactly those degradations and drives the DRIVER-GATED c1-c7
  * bodies (`SparkEntry.queries`, not the curated-layer twins) over
  * it, pinning each query's degrade contract:
  *
  *   c1  null-rating movies excluded by the predicate; null-YEAR
  *       movies flow through with a null year
  *   c2  sentinel-only movies absent from a named genre; zero-link
  *       movies absent entirely
  *   c3  zero-rating movies absent (inner join), null years carried
  *   c4  'N/A' and NULL directors excluded; AVG ignores null ratings
  *       (the SQL-AVG semantics — count(*) would deflate the mean)
  *   c5  an unsatisfied HAVING degrades to an EMPTY result, same
  *       schema, no error
  *   c6  the audit counts every injected null class exactly
  *   c7  histogram over the degraded ratings is exact
  */
class CanonicalDegradeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  /** 22-movie fixture: ids 1-13 are the no-year class (9.01..9.13 so
    * they dominate c1's top-10), 14 null rating, 15 'N/A' director,
    * 16 null director, 17-19 DIR_A, 20-21 DIR_B, 22 has no ratings at
    * all (the empty-links class). Genres ride the junction: a movie's
    * genres are the nation keys of the suppliers (users) who rated it
    * — user 102 maps to the "(no genres listed)" sentinel. */
  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("canon_degrade").toString
    val noYear = (1 to 13).map(i =>
      (i.toLong, s"noyear_$i", "DIR_NOYEAR", s"tt$i",
        Option.empty[Int], Option(9.0 + i * 0.01)))
    val rest = Seq(
      (14L, "nullrating", "DIR_A", "tt14", Option(2000), Option.empty[Double]),
      (15L, "na_dir", "N/A", "tt15", Option(2001), Option(5.0)),
      (16L, "null_dir", null.asInstanceOf[String], "tt16", Option(2002), Option(5.1)),
      (17L, "a1", "DIR_A", "tt17", Option(2003), Option(6.0)),
      (18L, "a2", "DIR_A", "tt18", Option(2004), Option(7.0)),
      (19L, "a3", "DIR_A", "tt19", Option(2005), Option(8.0)),
      (20L, "b1", "DIR_B", "tt20", Option(2006), Option(8.5)),
      (21L, "b2", "DIR_B", "tt21", Option(2007), Option(8.6)),
      (22L, "norating", "DIR_A", "tt22", Option(2008), Option(4.2)))
    (noYear ++ rest)
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((0, "(no genres listed)", 0), (3, "NATION_3", 0), (2, "COMEDY", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq((100L, "S100", 3, 0.0), (101L, "S101", 2, 0.0), (102L, "S102", 0, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    // (movie, user, quantity) ratings; movie 1 is rated ONLY by the
    // sentinel-genre user, movie 22 by nobody
    val ratings: Seq[(Long, Long, Double)] =
      Seq((1L, 102L, 3.0), (1L, 102L, 3.0)) ++
        Seq.fill(3)((2L, 100L, 4.0)) ++
        Seq(17L, 18L, 19L).flatMap(m =>
          Seq((m, 100L, 4.0), (m, 100L, 4.0), (m, 101L, 4.0))) ++
        Seq.fill(4)((20L, 100L, 5.0)) ++
        Seq((14L, 101L, 4.0), (15L, 101L, 4.0), (16L, 101L, 4.0),
          (21L, 101L, 4.0))
    ratings.zipWithIndex.map { case ((m, u, q), i) =>
      (i.toLong + 1, m, u, 1, q, 0.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def run(name: String) =
    SparkEntry.queries(name)(spark, fixtureDir)

  test("c1: null-rating movies drop, no-year movies flow through with null year") {
    val rows = run("c1_top_rated").collect()
    assert(rows.length === 10)
    val titles = rows.map(_.getString(0)).toSet
    assert(!titles.contains("nullrating"), "a NULL-rating movie entered the top-10")
    // the 9.01..9.13 no-year block dominates: every returned row is a
    // no-year title carried with a NULL year, not dropped
    assert(titles.forall(_.startsWith("noyear_")))
    assert(rows.forall(_.isNullAt(2)), "release_year must flow through as NULL")
  }

  test("c2: sentinel-only and zero-link movies are absent from a named genre") {
    val rows = run("c2_movies_by_genre").collect()
    val titles = rows.map(_.getString(0)).toSet
    assert(titles === Set("noyear_2", "a1", "a2", "a3", "b1"),
      s"NATION_3 membership wrong: $titles")
    assert(rows.forall(_.getString(2) === "NATION_3"))
  }

  test("c3: zero-rating movies never join; counts and null years are exact") {
    val rows = run("c3_most_rated").collect()
    assert(rows.length === 10)
    val byTitle = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(!byTitle.contains("norating"), "an unrated movie joined c3")
    assert(byTitle("b1") === 4L && byTitle("noyear_2") === 3L)
    assert(byTitle("noyear_1") === 2L)
    val noYearRow = rows.find(_.getString(0) === "noyear_1").get
    assert(noYearRow.isNullAt(1), "c3 must carry the null year through")
  }

  test("c4: N/A and NULL directors excluded; AVG ignores null ratings") {
    val rows = run("c4_by_director").collect()
    val byDir = rows.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byDir.keySet === Set("DIR_NOYEAR", "DIR_A"),
      s"degraded directors leaked or HAVING broke: ${byDir.keySet}")
    assert(byDir("DIR_NOYEAR") === ((13L, 9.07)))
    // DIR_A: 5 movies, one with a NULL rating — movie_count counts all
    // 5 but the mean averages the 4 rated ones: (6+7+8+4.2)/4 = 6.3
    assert(byDir("DIR_A") === ((5L, 6.3)))
  }

  test("c5: an unsatisfied HAVING degrades to empty, same schema, no error") {
    val df = run("c5_by_user")
    assert(df.columns.toSeq === Seq("user_id", "rating_count", "avg_rating"))
    assert(df.count() === 0L)
  }

  test("c6: the audit counts every injected null class exactly") {
    val r = run("c6_null_audit").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((22L, 0L, 1L, 1L, 13L)))
  }

  test("c7: histogram over the degraded ratings is exact") {
    val hist = run("c7_rating_histogram").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(hist === Map(3.0 -> 2L, 4.0 -> 16L, 5.0 -> 4L))
  }
}
