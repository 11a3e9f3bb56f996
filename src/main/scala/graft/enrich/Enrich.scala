package graft.enrich

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Input row for the enrichment operator. */
case class EnrichInput(
    movieId: Int,
    clean_title: String,
    release_year: Option[Int],
    imdb_id_lookup: Option[String])

/** Output of the 3-strategy enrichment ladder, with strategy
  * attribution (README.md:615-621 success-rate metrics) and an error
  * reason for the misses log (etl1.py:250-261). */
case class EnrichResult(
    movieId: Int,
    imdb_id: Option[String],
    director: Option[String],
    plot: Option[String],
    box_office: Option[String],
    imdb_rating: Option[String],
    runtime: Option[String],
    strategy: Option[String],
    error_reason: Option[String],
    imdb_id_lookup: Option[String])

/** S4-S6 + J1: the REST enrichment operator (SURVEY.md §2.1).
  *
  * Spark-first shape: the per-row point lookup against links
  * (etl1.py:75-90) becomes one broadcast left join; the HTTP ladder
  * runs inside `mapPartitions` with one client and one token-bucket per
  * partition. The cap is applied after an explicit orderBy(movieId) —
  * pandas `head(400)` relied on file order, which Spark must never do
  * (SURVEY.md §7.4 determinism policy).
  *
  * Rate limiting in a distributed runtime: `singlePartition = true`
  * (default) coalesces the capped candidate set to one partition — a
  * global rate limit, faithful to the reference's serial 0.2 s cadence.
  * At scale set it false: each of P partitions gets delayMs, so the
  * aggregate rate is P/delay — size P to the provider quota.
  */
object Enrich {

  def enrich(
      spark: SparkSession,
      transformedMovies: DataFrame,
      links: DataFrame,
      client: EnrichmentClient,
      cap: Int = 400,
      delayMs: Long = 0L,
      interRetryDelayMs: Long = 0L, // reference sleeps 0.1 s between ladder rungs (etl1.py:212,233)
      singlePartition: Boolean = true): DataFrame = {
    import spark.implicits._

    // J1: imdbId fallback via broadcast left join (materializes the
    // lookup once instead of N per-row probes).
    val linkIds = links.select(
      col("movieId"),
      TextFunctions.formatImdbId(col("imdbId")).as("imdb_id_lookup"))

    // S6: deterministic cap — orderBy before limit.
    val candidates = transformedMovies
      .orderBy(col("movieId"))
      .limit(cap)
      .join(broadcast(linkIds), Seq("movieId"), "left")
      .select(
        col("movieId"), col("clean_title"), col("release_year"),
        col("imdb_id_lookup"))
      .as[EnrichInput]

    val partitioned =
      if (singlePartition) candidates.coalesce(1) else candidates

    val enriched: Dataset[EnrichResult] = partitioned.mapPartitions { rows =>
      rows.map { in =>
        if (delayMs > 0) Thread.sleep(delayMs) // S6 token bucket (fixed cadence)
        try {
          // Strategy ladder (etl1.py:176-244): title+year → title → imdb id,
          // with the reference's short pause between rungs.
          def pause(): Unit = if (interRetryDelayMs > 0) Thread.sleep(interRetryDelayMs)
          val s1 = in.release_year.flatMap(y => client.byTitleYear(in.clean_title, y))
            .map(r => (r, "title_year"))
          val s2 = s1.orElse { pause()
            client.byTitle(in.clean_title).map(r => (r, "title_only")) }
          val s3 = s2.orElse { pause()
            in.imdb_id_lookup.flatMap(client.byImdbId).map(r => (r, "imdb_id")) }
          s3 match {
            case Some((r, strat)) => EnrichResult(in.movieId,
              r.imdbId, r.director, r.plot, r.boxOffice, r.imdbRating, r.runtime,
              Some(strat), None, in.imdb_id_lookup)
            case None => EnrichResult(in.movieId,
              None, None, None, None, None, None, None, Some("not_found"),
              in.imdb_id_lookup)
          }
        } catch {
          case e: Exception => EnrichResult(in.movieId,
            None, None, None, None, None, None, None,
            Some(s"error: ${e.getClass.getSimpleName}"), in.imdb_id_lookup)
        }
      }
    }

    // Left-join enrichment results back onto the full movie set; numeric
    // coercion of imdbRating ("N/A" → null) via try-style guard (F5).
    val resultCols = enriched.toDF()
      .withColumn("imdb_rating",
        when(col("imdb_rating").rlike("^[0-9]+(\\.[0-9]+)?$"),
          col("imdb_rating").cast("double")))
      .withColumnRenamed("movieId", "e_movieId")

    transformedMovies.join(
      resultCols, col("movieId") === col("e_movieId"), "left")
      .drop("e_movieId")
  }

  /** S7: the misses log — attempted-but-unenriched rows with the 10
    * diagnostic columns of etl1.py:250-261. */
  def missesLog(enrichedMovies: DataFrame): DataFrame =
    enrichedMovies
      .filter(col("strategy").isNull && col("error_reason").isNotNull)
      .select(
        col("movieId").as("movie_id"),
        col("title").as("original_title"),
        col("clean_title").as("normalized_title"),
        coalesce(col("release_year").cast("string"), lit("N/A")).as("release_year"),
        coalesce(col("genres"), lit("N/A")).as("genres"),
        TextFunctions.yesNo(col("imdb_id_lookup")).as("imdb_id_available"),
        coalesce(col("imdb_id_lookup"), lit("N/A")).as("imdb_id"),
        // only the rungs the ladder actually tried — concat_ws drops the
        // null entries. Pinned deviation: the reference labels the FIRST
        // request 'Title+Year' even when no year exists (it just omits
        // the y param, etl1.py:188-196), so its no-year misses log
        // 'Title+Year' and never 'Title Only' (that rung requires a
        // year, etl1.py:210). Here the labels follow what was actually
        // sent: a no-year first request is title_only.
        concat_ws(",",
          when(col("release_year").isNotNull, lit("title_year")),
          lit("title_only"),
          when(col("imdb_id_lookup").isNotNull, lit("imdb_id")))
          .as("strategies_attempted"),
        col("error_reason"),
        date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss").as("timestamp"))
}
