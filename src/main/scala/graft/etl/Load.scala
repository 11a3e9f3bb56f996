package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** S8-S12: sinks + load-plan sequencing (SURVEY.md §2.1).
  *
  * Default target is a Parquet curated layer (testable offline; the
  * lakehouse shape for scale). JDBC is a config-gated thin wrapper —
  * batching and truncate are writer options, not hand-rolled loops.
  *
  * The reference's per-row insert error tolerance (etl1.py:412-415) has
  * no JDBC-writer analog; the Spark-idiomatic equivalent is
  * validate-then-write: invalid rows split into a rejects DataFrame
  * (same guarantee — a bad row never aborts the load — but vectorized).
  */
object Load {

  /** Split movies into (valid, rejects): a row must have movie_id and
    * title (schema.sql:9-10 NOT NULL). */
  def validateMovies(curated: DataFrame): (DataFrame, DataFrame) = {
    val ok = col("movie_id").isNotNull && col("title").isNotNull
    (curated.filter(ok), curated.filter(!ok))
  }

  /** S11: idempotent full-refresh into a parquet curated layer. Write
    * order mirrors the reference's FK-safe sequencing (children after
    * parents on write; the reference deleted children first —
    * etl1.py:380-382): movies → genres → movie_genres → ratings.
    * Overwrite mode = the delete-then-insert refresh semantics.
    */
  def writeCurated(outDir: String,
                   movies: DataFrame,
                   genres: DataFrame,
                   movieGenres: DataFrame,
                   ratings: DataFrame): Unit = {
    // S8 storage-boundary casts: Decimal at rest (schema.sql:16,41).
    val moviesAtRest = movies
      .withColumn("imdb_rating", col("imdb_rating").cast("decimal(3,1)"))
      .withColumn("created_at", current_timestamp())
    val ratingsAtRest = ratings
      .withColumn("rating", col("rating").cast("decimal(2,1)"))
    moviesAtRest.write.mode(SaveMode.Overwrite).parquet(s"$outDir/movies")
    genres.write.mode(SaveMode.Overwrite).parquet(s"$outDir/genres")
    movieGenres.write.mode(SaveMode.Overwrite).parquet(s"$outDir/movie_genres")
    ratingsAtRest.write.mode(SaveMode.Overwrite).parquet(s"$outDir/ratings")
  }

  /** S7: misses log as a single headered CSV (etl1.py:263-281). */
  def writeMissesLog(outDir: String, misses: DataFrame): Unit =
    misses.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$outDir/missing_movies")

  /** S8-S10 JDBC variant: truncate-refresh + batched writes via writer
    * options (batchsize replicates etl1.py:497's 1000-row batching).
    * Caller sequences tables child-first per S11. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties, batchSize: Int = 1000): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("truncate", "true")
      .option("batchsize", batchSize)
      .jdbc(url, table, props)
}
