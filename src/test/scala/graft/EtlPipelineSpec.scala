package graft

import graft.enrich.{OmdbRecord, StubEnrichmentClient}
import graft.etl.{Extract, MoviePipeline}
import graft.quality.DataQuality
import graft.queries.CanonicalQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden run (SURVEY.md §5.2.3) on the real MovieLens data
  * at /root/reference/data with the deterministic offline stub
  * (FIXTURES.md §E). Expected counts measured from the data itself:
  * 9,742 movies, 20 genres, 22,084 junction rows, 100,836 ratings
  * (the README's 23,423 junction figure is self-reported drift).
  */
class EtlPipelineSpec extends AnyFunSuite with SparkTestSession {

  private val dataDir = "/root/reference/data"

  // Stub exercising all three ladder rungs (FIXTURES.md §E):
  // movie 1 hits title+year, movie 2 falls through to imdb-id (links row
  // 2 = 0113497), others miss -> misses log.
  private val stub = new StubEnrichmentClient(
    byTitleYearMap = Map(("Toy Story", 1995) -> OmdbRecord(
      Some("tt0114709"), Some("John Lasseter"), Some("plot"),
      Some("$373,554,033"), Some("8.3"), Some("81 min"))),
    byTitleMap = Map("Grumpier Old Men" -> OmdbRecord(
      Some("tt0113228"), Some("Howard Deutch"), Some("N/A"),
      None, Some("N/A"), Some("101 min"))),
    byIdMap = Map("tt0113497" -> OmdbRecord(
      Some("tt0113497"), Some("Joe Johnston"), Some("plot2"),
      None, Some("7.1"), Some("104 min"))))

  private lazy val result = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_etl").toString
    MoviePipeline.run(spark, dataDir, stub, cap = 4, outDir = Some(tmp))
  }

  test("row counts match the measured reference data") {
    val m = result.metrics
    assert(m.nMovies === 9742L)
    assert(m.nGenres === 20L)
    assert(m.nMovieGenres === 22084L)
    assert(m.nRatingsRaw === 100836L)
    assert(m.nRatingsClean === 100836L) // real data has no bad rows
    assert(m.nRatingsRemoved === 0L)
  }

  test("enrichment ladder: strategy attribution + misses") {
    val m = result.metrics
    assert(m.nEnrichAttempted === 4L)
    assert(m.strategyHits.getOrElse("title_year", 0L) === 1L) // Toy Story
    assert(m.strategyHits.getOrElse("title_only", 0L) === 1L) // Grumpier...
    assert(m.strategyHits.getOrElse("imdb_id", 0L) === 1L)    // Jumanji via links
    assert(result.misses.count() === 1L)                      // movie 4
    assert(result.misses.columns.toSeq === Seq(
      "movie_id", "original_title", "normalized_title", "release_year",
      "genres", "imdb_id_available", "imdb_id", "strategies_attempted",
      "error_reason", "timestamp"))
  }

  test("genre dim has dense sorted ids 1..20 incl. sentinel and IMAX") {
    val g = result.genres.orderBy(col("genre_id")).collect()
    assert(g.map(_.getInt(0)).toSeq === (1 to 20))
    assert(g.head.getString(1) === "(no genres listed)") // sorts first
    assert(g.map(_.getString(1)).contains("IMAX"))
    assert(g.map(_.getString(1)).toSeq === g.map(_.getString(1)).toSeq.sorted)
  }

  test("junction integrity: no FK violations (J4)") {
    assert(DataQuality.fkViolations(
      result.movieGenres, "movie_id", result.movies, "movie_id").count() === 0L)
    assert(DataQuality.fkViolations(
      result.movieGenres, "genre_id", result.genres, "genre_id").count() === 0L)
  }

  test("canonical Q5: top heavy-rater matches independent oracle") {
    // Computed independently (DuckDB over ratings.csv): user 452 leads
    // with 202 ratings, avg 4.557.
    val top = CanonicalQueries.q5ByUser(result.ratings).head()
    assert(top.getInt(0) === 452)
    assert(top.getLong(1) === 202L)
    assert(math.abs(top.getDouble(2) - 4.557) < 0.001)
  }

  test("canonical Q7: rating histogram matches independent oracle") {
    val hist = CanonicalQueries.q7RatingHistogram(result.ratings)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val expected = Map(0.5 -> 1370L, 1.0 -> 2811L, 1.5 -> 1791L,
      2.0 -> 7551L, 2.5 -> 5550L, 3.0 -> 20047L, 3.5 -> 13136L,
      4.0 -> 26818L, 4.5 -> 8551L, 5.0 -> 13211L)
    assert(hist === expected)
  }

  test("canonical Q1: full result matches the stub-derivable oracle") {
    // Only the stub-enriched movies carry an imdb_rating (movie 3's
    // OMDb rating is the literal "N/A" → null), so the complete top-10
    // result is exactly the two rated movies, best first — derivable
    // by hand from the stub map plus the raw titles.
    val q1 = CanonicalQueries.q1TopRated(result.movies).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2), r.getString(3)))
    assert(q1.toSeq === Seq(
      ("Toy Story", 8.3, 1995, "John Lasseter"),
      ("Jumanji", 7.1, 1995, "Joe Johnston")))
  }

  test("canonical Q2: full result matches independent oracle") {
    // Computed independently (DuckDB over movies.csv with the same
    // normalize/extract-year regexes): first 20 Action movies by
    // movie_id. The genres column is "Action" on every row because the
    // genre filter precedes the GROUP_CONCAT.
    val q2 = CanonicalQueries.q2MoviesByGenre(
      result.movies, result.movieGenres, result.genres, "Action").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val titles = Seq("Heat", "Sudden Death", "GoldenEye", "Cutthroat Island",
      "Money Train", "Assassins", "Dead Presidents", "Mortal Kombat",
      "Lawnmower Man 2: Beyond Cyberspace", "From Dusk Till Dawn",
      "Fair Game", "Screamers", "The Crossing Guard", "White Squall",
      "Nick of Time", "Broken Arrow", "Braveheart", "Rumble in the Bronx",
      "Bad Boys", "Rob Roy")
    val years = Seq(1995, 1995, 1995, 1995, 1995, 1995, 1995, 1995, 1996,
      1996, 1995, 1995, 1995, 1996, 1995, 1996, 1995, 1995, 1995, 1995)
    assert(q2.toSeq === titles.zip(years).map { case (t, y) => (t, y, "Action") })
  }

  test("canonical Q3: full result matches independent oracle") {
    // Computed independently (DuckDB over ratings.csv + movies.csv):
    // top-10 by rating count; none of the ten is stub-enriched, so
    // imdb_rating is null on every row.
    val q3 = CanonicalQueries.q3MostRated(result.movies, result.ratings)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4))))
    val expected = Seq(
      ("Forrest Gump", 1994, 329L, 4.164133738601824),
      ("The Shawshank Redemption", 1994, 317L, 4.429022082018927),
      ("Pulp Fiction", 1994, 307L, 4.197068403908795),
      ("The Silence of the Lambs", 1991, 279L, 4.161290322580645),
      ("The Matrix", 1999, 278L, 4.192446043165468),
      ("Star Wars: Episode IV - A New Hope", 1977, 251L, 4.231075697211155),
      ("Jurassic Park", 1993, 238L, 3.75),
      ("Braveheart", 1995, 237L, 4.031645569620253),
      ("Terminator 2: Judgment Day", 1991, 224L, 3.970982142857143),
      ("Schindler's List", 1993, 220L, 4.225))
    assert(q3.length === 10)
    q3.zip(expected).foreach { case ((t, y, c, a, r), (et, ey, ec, ea)) =>
      assert(t === et); assert(y === ey); assert(c === ec)
      assert(math.abs(a - ea) < 1e-12, s"$t avg $a != $ea")
      assert(r.isEmpty, s"$t should have null imdb_rating")
    }
  }

  test("canonical Q4: full result pinned (empty under the >=3 HAVING)") {
    // The stub enriches three movies with three DISTINCT directors, so
    // the movie_count >= 3 HAVING keeps nobody — and that emptiness is
    // the correct full result, not a nulled-out director column: the
    // pre-HAVING input really carries the three directors.
    assert(CanonicalQueries.q4ByDirector(result.movies).collect().isEmpty)
    val directors = result.movies
      .filter(col("director").isNotNull && col("director") =!= "N/A")
      .select(col("director")).collect().map(_.getString(0)).sorted.toSeq
    assert(directors === Seq("Howard Deutch", "Joe Johnston", "John Lasseter"))
  }

  test("canonical Q6: full null-audit row pinned") {
    val q6 = CanonicalQueries.q6NullAudit(result.movies).head()
    assert(q6.getLong(0) === 9742L)        // total_movies
    assert(q6.getLong(1) === 9742L - 3L)   // 3 stub enrichments set imdb_id
    assert(q6.getLong(2) === 9742L - 3L)   // same three set director
    assert(q6.getLong(3) === 9742L - 2L)   // movie 3's rating is "N/A" → null
    assert(q6.getLong(4) === 13L)          // titles with no (YYYY) suffix
  }

  test("data-quality run report: counts line up, zero FK violations") {
    val report = graft.quality.DataQuality.runReport(
      result.movies, result.genres, result.movieGenres, result.ratings).head()
    assert(report.getAs[Long]("n_movies") === 9742L)
    assert(report.getAs[Long]("n_genres") === 20L)
    assert(report.getAs[Long]("n_movie_genres") === 22084L)
    assert(report.getAs[Long]("n_ratings") === 100836L)
    assert(report.getAs[Long]("fk_violations") === 0L)
    assert(report.getAs[Long]("null_imdb_id") === 9742L - 3L)
    // J5 / A8 / A9 operators directly
    assert(graft.quality.DataQuality.missingKeyCount(
      result.movieGenres, "movie_id", result.movies, "movie_id") === 0L)
    val audit = graft.quality.DataQuality.nullAudit(
      result.movies, Seq("director", "plot")).head()
    assert(audit.getAs[Long]("total_rows") === 9742L)
    assert(graft.quality.DataQuality.histogram(result.genres, "genre_name")
      .count() === 20L)
  }

  test("curated movies round-trip as a typed Dataset[Movie]") {
    import spark.implicits._
    val ds = result.movies
      .drop("created_at") // write-time audit column, not part of the row type
      .as[graft.etl.Movie]
    assert(ds.count() === 9742L)
    val toy = ds.filter(_.movie_id == 1).head()
    assert(toy.title === "Toy Story")
    assert(toy.release_year === Some(1995))
    assert(toy.imdb_rating === Some(8.3)) // from the stub enrichment
  }

  test("S3: missing links.csv degrades to empty typed table") {
    val df = Extract.links(spark, "/nonexistent/links.csv")
    assert(df.columns.toSeq === Seq("movieId", "imdbId", "tmdbId"))
    assert(df.count() === 0L)
  }

  test("S10: JDBC truncate-refresh round-trip against embedded Derby") {
    // Round-9: the one §2.1 row that had zero execution evidence —
    // drive Load.writeJdbc against a REAL (embedded, in-JVM) Derby
    // database: table creation on first write, TRUNCATE-refresh on
    // rewrite, 1000-row batched inserts over an actual JDBC
    // connection (the reference's load semantics, etl1.py:475-519),
    // then read every table back through spark.read.jdbc.
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.stream.error.file", s"$dbDir/derby.log")
    val url = s"jdbc:derby:$dbDir/moviedb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    def roundTrip(name: String, df: org.apache.spark.sql.DataFrame) = {
      graft.etl.Load.writeJdbc(df, url, name, props)
      spark.read.jdbc(url, name, props)
    }
    // parent-first sequencing (S11), same order as writeCurated
    assert(roundTrip("movies", result.movies).count() === 9742L)
    assert(roundTrip("genres", result.genres).count() === 20L)
    assert(roundTrip("movie_genres", result.movieGenres).count() === 22084L)
    val ratingsBack = roundTrip("ratings", result.ratings)
    assert(ratingsBack.count() === 100836L)
    // values survive the trip, not just counts: exact integer checksum
    // on the junction table, mean rating to rounding tolerance
    val mgSum = spark.read.jdbc(url, "movie_genres", props)
      .agg(sum(col("movie_id")), sum(col("genre_id"))).head()
    val mgExpected = result.movieGenres
      .agg(sum(col("movie_id")), sum(col("genre_id"))).head()
    assert(mgSum === mgExpected)
    assert(math.abs(ratingsBack.agg(avg(col("rating"))).head().getDouble(0)
      - result.ratings.agg(avg(col("rating"))).head().getDouble(0)) < 1e-9)
    // idempotent refresh: a second Overwrite write must TRUNCATE (not
    // drop/create) and land the same rows — counts stable, spot row intact
    graft.etl.Load.writeJdbc(result.movies, url, "movies", props)
    val moviesBack = spark.read.jdbc(url, "movies", props)
    assert(moviesBack.count() === 9742L)
    assert(moviesBack.filter(col("movie_id") === 1)
      .select("title").head().getString(0) === "Toy Story")
  }

  test("persist lifetime: ladder fires once; actions after run() add zero calls") {
    val dir = java.nio.file.Files.createTempDirectory("graft_count").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "movies.csv"),
      """movieId,title,genres
        |1,Alpha (1995),Drama
        |2,Beta,Comedy
        |3,Gamma (2000),Action
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "links.csv"),
      """movieId,imdbId,tmdbId
        |1,113497,862
        |3,114709,8844
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "ratings.csv"),
      """userId,movieId,rating,timestamp
        |1,1,4.0,828124615
        |""".stripMargin)
    CountingStub.calls.set(0)
    val r = MoviePipeline.run(spark, dir, new CountingStub, cap = 3)
    // every rung misses: movie 1 (year+link) 3 calls, movie 2 (neither) 1,
    // movie 3 (year+link) 3 — exactly once each despite run()'s own
    // several metric actions, because the enrichment plan is cached.
    assert(CountingStub.calls.get() === 7)
    r.movies.count(); r.misses.collect(); r.movies.collect()
    assert(CountingStub.calls.get() === 7) // zero re-fires after run()
    // only the rungs actually tried appear in the misses log
    val att = r.misses.orderBy(col("movie_id"))
      .select("movie_id", "strategies_attempted")
      .collect().map(x => x.getInt(0) -> x.getString(1)).toMap
    assert(att(1) === "title_year,title_only,imdb_id")
    assert(att(2) === "title_only")
    assert(att(3) === "title_year,title_only,imdb_id")
    r.release()
  }
}

/** All-miss client counting every rung invocation. The counter is
  * JVM-static (companion), not instance state: local-mode closures are
  * serialized/deserialized, so an instance field would count into a
  * detached copy. */
class CountingStub extends graft.enrich.EnrichmentClient {
  import CountingStub.calls
  override def byTitleYear(t: String, y: Int): Option[graft.enrich.OmdbRecord] = {
    calls.incrementAndGet(); None
  }
  override def byTitle(t: String): Option[graft.enrich.OmdbRecord] = {
    calls.incrementAndGet(); None
  }
  override def byImdbId(id: String): Option[graft.enrich.OmdbRecord] = {
    calls.incrementAndGet(); None
  }
}
object CountingStub {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}
