package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J4/J5 + A8-A10: the reference's data-quality surface
  * (README.md:482-488,675-688) as first-class operators. The reference
  * got FK integrity "for free" from MySQL; a lakehouse engine must
  * check it explicitly — as anti joins, which cost one shuffle and
  * return the violating rows themselves, not just a boolean.
  */
object DataQuality {

  /** J4: FK violations — child keys with no parent. Empty ⇒ integrity
    * holds. */
  def fkViolations(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent, child(childKey) === parent(parentKey), "left_anti")

  /** J5: key-consistency diagnostic (README.md:482-488) — count of keys
    * present on the left but missing on the right. */
  def missingKeyCount(left: DataFrame, leftKey: String,
                      right: DataFrame, rightKey: String): Long =
    // internal aliases: the two key columns may share a name, which
    // would make the join condition ambiguous
    left.select(col(leftKey).as("__lk")).distinct()
      .join(right.select(col(rightKey).as("__rk")).distinct(),
        col("__lk") === col("__rk"), "left_anti")
      .count()

  /** A8: per-column null counts in one pass. */
  def nullAudit(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("total_rows"),
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c")): _*)

  /** A9: value histogram. */
  def histogram(df: DataFrame, colName: String): DataFrame =
    df.groupBy(col(colName)).agg(count(lit(1)).as("count")).orderBy(col(colName))

  /** §3.3 metrics row: one-row report over the curated movie schema —
    * row counts, FK violation counts, and null rates for the audited
    * columns — the per-run artifact the reference assembled by hand. */
  def runReport(movies: DataFrame, genres: DataFrame,
                movieGenres: DataFrame, ratings: DataFrame): DataFrame = {
    val mgMovieViol = fkViolations(movieGenres, "movie_id", movies, "movie_id").count()
    val mgGenreViol = fkViolations(movieGenres, "genre_id", genres, "genre_id").count()
    val rViol = fkViolations(ratings, "movie_id", movies, "movie_id").count()
    movies.agg(
      count(lit(1)).as("n_movies"),
      sum(when(col("imdb_id").isNull, 1L).otherwise(0L)).as("null_imdb_id"),
      sum(when(col("release_year").isNull, 1L).otherwise(0L)).as("null_year"))
      .withColumn("n_genres", lit(genres.count()))
      .withColumn("n_movie_genres", lit(movieGenres.count()))
      .withColumn("n_ratings", lit(ratings.count()))
      .withColumn("fk_violations",
        lit(mgMovieViol + mgGenreViol + rViol))
  }
}
