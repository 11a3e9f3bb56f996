package graft.etl

import graft.enrich.{Enrich, EnrichmentClient}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end movie pipeline (SURVEY.md §3.1): extract → transform →
  * enrich → load, lazily composed — extract/transform build plans;
  * Catalyst fires at the writes. Returns the A10 run metrics the
  * reference logs (row counts, removed ratings, enrichment success
  * rate, strategy hit rates — etl1.py:301-346, README.md:615-621).
  */
object MoviePipeline {

  case class RunMetrics(
      nMovies: Long,
      nGenres: Long,
      nMovieGenres: Long,
      nRatingsRaw: Long,
      nRatingsClean: Long,
      nRatingsRemoved: Long,
      nEnrichAttempted: Long,
      nEnrichSucceeded: Long,
      strategyHits: Map[String, Long])

  case class Result(
      movies: DataFrame,
      genres: DataFrame,
      movieGenres: DataFrame,
      ratings: DataFrame,
      misses: DataFrame,
      metrics: RunMetrics,
      /** Drops the cached enrichment that `movies`/`misses` are rooted
        * in. The cache must outlive the Result (the enrichment plan is
        * side-effecting — uncached re-execution would re-fire the HTTP
        * ladder once per downstream action and could diverge from the
        * written curated layer); call this once the frames are no longer
        * needed. */
      release: () => Unit = () => ())

  def run(spark: SparkSession,
          dataDir: String,
          client: EnrichmentClient,
          cap: Int = 400,
          outDir: Option[String] = None): Result = {

    // Extract (S1-S3)
    val moviesRaw  = Extract.movies(spark, s"$dataDir/movies.csv")
    val ratingsRaw = Extract.ratings(spark, s"$dataDir/ratings.csv")
    val links      = Extract.links(spark, s"$dataDir/links.csv")

    // Transform (P1, F1/F2)
    val transformed = Transform.transformMovies(moviesRaw)

    // Enrich (S4-S6, J1). The enrichment plan is SIDE-EFFECTING (HTTP
    // calls); persist it so the several downstream actions (writes +
    // metrics counts) execute the ladder exactly once — otherwise every
    // action re-fires the API calls and metrics can diverge from the
    // written output.
    val enriched = Enrich.enrich(spark, transformed, links, client, cap).persist()

    // Dimensions + junction (A1-A3)
    val genres      = Transform.genreDim(transformed)
    val movieGenres = Transform.movieGenres(transformed, genres)

    // Ratings cleaning (P4/F5). The raw-row count rides along as an
    // Observation metric, so raw+clean counts cost ONE pass over the
    // file instead of two — the A10 metrics pattern that matters when
    // "the file" is 100 TB.
    val ratingsObs = org.apache.spark.sql.Observation("ratings_raw")
    val ratingsClean = Transform.cleanRatings(
      ratingsRaw.observe(ratingsObs, count(lit(1)).as("n_raw")))

    // Curated projection (P3) + validation split (S8 policy)
    val curated          = Transform.curatedMovies(enriched)
    val (validMovies, _) = Load.validateMovies(curated)

    // Misses log (S7)
    val misses = Enrich.missesLog(enriched)

    // Load (S11 ordering) — optional, parquet curated layer
    outDir.foreach { dir =>
      Load.writeCurated(dir, validMovies, genres, movieGenres, ratingsClean)
      Load.writeMissesLog(dir, misses)
    }

    // Metrics (A10) — clean count triggers the plan; the raw count
    // arrives via the Observation from the same pass.
    val nRatingsClean = ratingsClean.count()
    val nRatingsRaw   = ratingsObs.get("n_raw").asInstanceOf[Long]
    val attempted = enriched.filter(
      col("strategy").isNotNull || col("error_reason").isNotNull)
    val strategyHits = attempted.filter(col("strategy").isNotNull)
      .groupBy(col("strategy")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val metrics = RunMetrics(
      nMovies = validMovies.count(),
      nGenres = genres.count(),
      nMovieGenres = movieGenres.count(),
      nRatingsRaw = nRatingsRaw,
      nRatingsClean = nRatingsClean,
      nRatingsRemoved = nRatingsRaw - nRatingsClean,
      nEnrichAttempted = attempted.count(),
      nEnrichSucceeded = strategyHits.values.sum,
      strategyHits = strategyHits)

    // NOT unpersisted here: Result.movies/misses are lazy plans rooted
    // in `enriched`; dropping the cache before the caller's actions
    // would re-execute the side-effecting ladder per action.
    Result(validMovies, genres, movieGenres, ratingsClean, misses, metrics,
      release = () => { enriched.unpersist(blocking = false); () })
  }
}
