package graft.queries

import graft.functions.ExactNum
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gated registrations of the reference's 7 canonical README
  * queries (SURVEY.md §3.2; reference README.md:528-602,675-688) —
  * round-18, VERDICT item 5. `CanonicalQueries` implements them over
  * the curated MovieLens layer (suite-tested against the real
  * reference data); the driver's oracle only sees the TPC-H-shaped
  * test tables, so these run the SAME query bodies over a faithful
  * 1:1 column transliteration, each mapping pinned here:
  *
  *   movies       → part      (movie_id=p_partkey, title=p_name,
  *                             release_year=p_size,
  *                             imdb_rating=p_retailprice,
  *                             director=p_brand, imdb_id=p_type)
  *   ratings      → lineitem  (movie_id=l_partkey, user_id=l_suppkey,
  *                             rating=l_quantity)
  *   genres       → nation    (genre_id=n_nationkey,
  *                             genre_name=n_name)
  *   movie_genres → DISTINCT (lineitem ⋈ supplier) pairs
  *                             (movie_id=l_partkey,
  *                             genre_id=s_nationkey) — the junction's
  *                             PK(movie_id, genre_id) is the distinct
  *
  * Two deliberate deviations from a verbatim `CanonicalQueries` call,
  * both repo-wide conventions (QuerySpec scaladoc): (1) c4/c5 compute
  * AVG through exact scaled-integer sums (`ExactNum`) — a floating
  * avg of 2-decimal doubles is order-dependent in its last bits, so
  * the plain `avg()` the suite-tested twins use is not
  * hash-comparable across engines; (2) c5's HAVING threshold is 600
  * (not the reference's 100): the transliterated "users" each carry
  * ~600 ratings at every gate SF, so 100 would be vacuously true and
  * 600 exercises the predicate's selectivity on both sides.
  */
object CanonicalTpch {

  private def movies(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey").as("movie_id"), col("p_name").as("title"),
      col("p_size").as("release_year"),
      col("p_retailprice").as("imdb_rating"),
      col("p_brand").as("director"), col("p_type").as("imdb_id"))

  private def ratings(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      col("l_partkey").as("movie_id"), col("l_suppkey").as("user_id"),
      col("l_quantity").as("rating"))

  private def genres(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir).select(
      col("n_nationkey").as("genre_id"), col("n_name").as("genre_name"))

  private def movieGenres(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("movie_id"),
        col("s_nationkey").as("genre_id"))
      .distinct()

  /** Q1: top 10 highest-rated (P9, O1) — `CanonicalQueries.q1TopRated`
    * body verbatim (no arithmetic, so the curated-layer twin is
    * exactly reusable). */
  private def c1(s: SparkSession, dir: String): DataFrame =
    CanonicalQueries.q1TopRated(movies(s, dir))

  private val c1Sql =
    """SELECT p_name AS title, p_retailprice AS imdb_rating,
      |  p_size AS release_year, p_brand AS director
      |FROM part
      |WHERE p_retailprice IS NOT NULL
      |ORDER BY p_retailprice DESC, p_partkey ASC
      |LIMIT 10""".stripMargin

  /** Q2: movies by genre with GROUP_CONCAT (J2, P10, A7, O4) —
    * `q2MoviesByGenre` verbatim over the mapped junction. */
  private def c2(s: SparkSession, dir: String): DataFrame =
    CanonicalQueries.q2MoviesByGenre(
      movies(s, dir), movieGenres(s, dir), genres(s, dir),
      genre = "NATION_3")

  private val c2Sql =
    """WITH mg AS (
      | SELECT DISTINCT l_partkey AS movie_id, s_nationkey AS genre_id
      | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey)
      |SELECT title, release_year, genres FROM (
      | SELECT p.p_partkey, p.p_name AS title, p.p_size AS release_year,
      |   string_agg(n.n_name, ',' ORDER BY n.n_name) AS genres
      | FROM part p
      | JOIN mg ON mg.movie_id = p.p_partkey
      | JOIN nation n ON n.n_nationkey = mg.genre_id
      | WHERE n.n_name = 'NATION_3'
      | GROUP BY 1, 2, 3
      | ORDER BY p.p_partkey LIMIT 20)""".stripMargin

  /** Q3: most-rated movies (J3, A4, O2) — `q3MostRated` verbatim.
    * The plain `avg(rating)` stays hash-exact here because the
    * transliterated ratings are integer-valued doubles (1..50): the
    * sums are exact integers in both engines at any order. */
  private def c3(s: SparkSession, dir: String): DataFrame =
    CanonicalQueries.q3MostRated(movies(s, dir), ratings(s, dir))

  private val c3Sql =
    """SELECT title, release_year, rating_count, avg_user_rating,
      |  imdb_rating
      |FROM (
      | SELECT p.p_partkey, p.p_name AS title, p.p_size AS release_year,
      |   p.p_retailprice AS imdb_rating,
      |   CAST(COUNT(*) AS BIGINT) AS rating_count,
      |   AVG(l.l_quantity) AS avg_user_rating
      | FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
      | GROUP BY 1, 2, 3, 4
      | ORDER BY rating_count DESC, p.p_partkey ASC
      | LIMIT 10)""".stripMargin

  /** Q4: movies by director with HAVING (P8, A5, O3). Exact-cents avg
    * (see object scaladoc); the reference's `director <> 'N/A'`
    * cleaning predicate rides along 1:1 (vacuous on p_brand — kept
    * for shape fidelity; the N/A-cleaning class is driver-gated
    * selectively by q01/q05's P8 coverage). */
  private def c4(s: SparkSession, dir: String): DataFrame =
    movies(s, dir)
      .filter(col("director").isNotNull && col("director") =!= "N/A")
      .groupBy(col("director"))
      .agg(count(lit(1)).as("movie_count"),
        // AVG denominator counts NON-NULL ratings (round-19): SQL AVG
        // ignores nulls, so a director with a null-rating movie must
        // average over the rated ones only — count(*) would silently
        // deflate the mean on degraded rows (no gate corpus carries
        // nulls, but the degrade fixture spec does)
        (sum(ExactNum.cents(col("imdb_rating"))).cast("double")
          / count(col("imdb_rating")) / 100.0).as("avg_rating"))
      .filter(col("movie_count") >= 3)
      .orderBy(col("avg_rating").desc, col("director").asc)
      .limit(20)

  private val c4Sql =
    """SELECT director, movie_count, avg_rating FROM (
      | SELECT p_brand AS director,
      |   CAST(COUNT(*) AS BIGINT) AS movie_count,
      |   CAST(SUM(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) AS DOUBLE)
      |     / COUNT(p_retailprice) / 100.0 AS avg_rating
      | FROM part
      | WHERE p_brand IS NOT NULL AND p_brand <> 'N/A'
      | GROUP BY 1
      | HAVING COUNT(*) >= 3
      | ORDER BY avg_rating DESC, director ASC
      | LIMIT 20)""".stripMargin

  /** Q5: average rating by user with HAVING (A6, O3). Exact-e4 avg;
    * threshold 600 per the object scaladoc. */
  private def c5(s: SparkSession, dir: String): DataFrame =
    ratings(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("rating_count"),
        (sum(ExactNum.e4(col("rating"))).cast("double")
          / count(lit(1)) / 10000.0).as("avg_rating"))
      .filter(col("rating_count") > 600)
      .orderBy(col("avg_rating").desc, col("user_id").asc)
      .limit(10)

  private val c5Sql =
    """SELECT user_id, rating_count, avg_rating FROM (
      | SELECT l_suppkey AS user_id,
      |   CAST(COUNT(*) AS BIGINT) AS rating_count,
      |   CAST(SUM(CAST(ROUND(l_quantity * 10000, 0) AS BIGINT)) AS DOUBLE)
      |     / COUNT(*) / 10000.0 AS avg_rating
      | FROM lineitem
      | GROUP BY 1
      | HAVING COUNT(*) > 600
      | ORDER BY avg_rating DESC, user_id ASC
      | LIMIT 10)""".stripMargin

  /** Q6: null-quality audit (A8) — `q6NullAudit` verbatim (pure
    * counters). The transliterated columns carry no nulls at the gate
    * SFs, so the audit's value here is the exact zero/total row. */
  private def c6(s: SparkSession, dir: String): DataFrame =
    CanonicalQueries.q6NullAudit(movies(s, dir))

  private val c6Sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS total_movies,
      |  CAST(SUM(CASE WHEN p_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_imdb_id,
      |  CAST(SUM(CASE WHEN p_brand IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_director,
      |  CAST(SUM(CASE WHEN p_retailprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_rating,
      |  CAST(SUM(CASE WHEN p_size IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_year
      |FROM part""".stripMargin

  /** Q7: rating distribution histogram (A9) — `q7RatingHistogram`
    * verbatim. */
  private def c7(s: SparkSession, dir: String): DataFrame =
    CanonicalQueries.q7RatingHistogram(ratings(s, dir))

  private val c7Sql =
    """SELECT l_quantity AS rating, CAST(COUNT(*) AS BIGINT) AS count
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("c1_top_rated", c1, Some(c1Sql)),
    QuerySpec("c2_movies_by_genre", c2, Some(c2Sql)),
    QuerySpec("c3_most_rated", c3, Some(c3Sql)),
    QuerySpec("c4_by_director", c4, Some(c4Sql)),
    QuerySpec("c5_by_user", c5, Some(c5Sql)),
    QuerySpec("c6_null_audit", c6, Some(c6Sql)),
    QuerySpec("c7_rating_histogram", c7, Some(c7Sql)))
}
