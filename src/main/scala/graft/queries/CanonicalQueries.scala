package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's 7 canonical README queries (SURVEY.md §3.2,
  * README.md:528-602,675-688) as DataFrame-DSL over the curated movie
  * tables. These run against the real MovieLens-derived curated layer
  * in the test suite; the TPC-H-shaped twins in Relational cover the
  * same operator classes under the driver's DuckDB oracle.
  *
  * Deviations from MySQL, pinned deliberately (SURVEY.md §7.4):
  * GROUP_CONCAT order is unspecified in MySQL — we sort ascending;
  * ties under LIMIT are broken by explicit keys so results are total.
  */
object CanonicalQueries {

  /** Q1: Top 10 highest-rated movies (P9, O1). */
  def q1TopRated(movies: DataFrame): DataFrame =
    movies.filter(col("imdb_rating").isNotNull)
      .orderBy(col("imdb_rating").desc, col("movie_id").asc)
      .limit(10)
      .select(col("title"), col("imdb_rating"), col("release_year"), col("director"))

  /** Q2: Movies by genre with GROUP_CONCAT (J2, P10, A7, O4). */
  def q2MoviesByGenre(movies: DataFrame, movieGenres: DataFrame,
                      genres: DataFrame, genre: String = "Action"): DataFrame =
    movies.join(movieGenres, "movie_id")
      .join(genres, "genre_id")
      .filter(col("genre_name") === genre)
      .groupBy(col("movie_id"), col("title"), col("release_year"))
      .agg(array_join(array_sort(collect_list(col("genre_name"))), ",").as("genres"))
      .orderBy(col("movie_id"))
      .limit(20)
      .select(col("title"), col("release_year"), col("genres"))

  /** Q3: Most-rated movies (J3, A4, O2). */
  def q3MostRated(movies: DataFrame, ratings: DataFrame): DataFrame =
    movies.join(ratings, "movie_id")
      .groupBy(col("movie_id"), col("title"), col("release_year"), col("imdb_rating"))
      .agg(count(lit(1)).as("rating_count"),
           avg(col("rating")).as("avg_user_rating"))
      .orderBy(col("rating_count").desc, col("movie_id").asc)
      .limit(10)
      .select(col("title"), col("release_year"), col("rating_count"),
        col("avg_user_rating"), col("imdb_rating"))

  /** Q4: Movies by director with HAVING (P8, A5, O3). */
  def q4ByDirector(movies: DataFrame): DataFrame =
    movies.filter(col("director").isNotNull && col("director") =!= "N/A")
      .groupBy(col("director"))
      .agg(count(lit(1)).as("movie_count"),
           avg(col("imdb_rating")).as("avg_rating"))
      .filter(col("movie_count") >= 3)
      .orderBy(col("avg_rating").desc, col("director").asc)
      .limit(20)

  /** Q5: Average rating by user with HAVING (A6, O3). */
  def q5ByUser(ratings: DataFrame): DataFrame =
    ratings.groupBy(col("user_id"))
      .agg(count(lit(1)).as("rating_count"),
           avg(col("rating").cast("double")).as("avg_rating"))
      .filter(col("rating_count") > 100)
      .orderBy(col("avg_rating").desc, col("user_id").asc)
      .limit(10)

  /** Q6: Null-quality audit (A8) — one row of null counters. */
  def q6NullAudit(movies: DataFrame): DataFrame =
    movies.agg(
      count(lit(1)).as("total_movies"),
      sum(when(col("imdb_id").isNull, 1L).otherwise(0L)).as("null_imdb_id"),
      sum(when(col("director").isNull, 1L).otherwise(0L)).as("null_director"),
      sum(when(col("imdb_rating").isNull, 1L).otherwise(0L)).as("null_rating"),
      sum(when(col("release_year").isNull, 1L).otherwise(0L)).as("null_year"))

  /** Q7: Rating distribution histogram (A9). */
  def q7RatingHistogram(ratings: DataFrame): DataFrame =
    ratings.groupBy(col("rating"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("rating"))
}
