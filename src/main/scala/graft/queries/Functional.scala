package graft.queries

import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-engine checks of the reference's scalar title functions
  * (SURVEY.md §2.6 F1/F2), driven through the driver's parquet tables:
  * titles are synthesized from part columns (`p_name (19xx)`), then the
  * *production* TextFunctions run on them in Spark while DuckDB mirrors
  * the identical regex sequence. This pins the function semantics —
  * anchored year extraction, null on no-match, paren stripping, article
  * movement — against an independent engine, not just unit fixtures.
  */
object Functional {

  /** F1: trailing-(YYYY) year extraction + strip (etl1.py:92-101).
    * `year_nomatch` runs the same extractor on a string with no year —
    * must be null, mirroring the 13 no-year MovieLens titles.
    */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val titled = Tables.part(s, dir).select(
      col("p_partkey"),
      concat(col("p_name"), lit(" ("),
        (lit(1900) + col("p_size")).cast("string"), lit(")")).as("title"),
      col("p_brand"))
    titled.select(
      col("p_partkey"),
      TextFunctions.extractYear(col("title")).as("release_year"),
      TextFunctions.stripYear(col("title")).as("clean_title"),
      TextFunctions.extractYear(col("p_brand")).as("year_nomatch"))
      .orderBy(col("p_partkey"))
  }

  private val q14Sql =
    """SELECT p_partkey,
      |  CASE WHEN regexp_matches(title, '\((\d{4})\)\s*$')
      |       THEN CAST(regexp_extract(title, '\((\d{4})\)\s*$', 1) AS INT) END AS release_year,
      |  trim(regexp_replace(title, '\s*\(\d{4}\)\s*$', '')) AS clean_title,
      |  CAST(NULL AS INT) AS year_nomatch
      |FROM (SELECT p_partkey,
      |        p_name || ' (' || CAST(1900 + p_size AS VARCHAR) || ')' AS title,
      |        p_brand
      |      FROM part)
      |ORDER BY p_partkey""".stripMargin

  /** F2: full title normalization (etl1.py:103-140) on titles shaped like
    * the hardest MovieLens cases — trailing article AND two parenthesized
    * segments: `"<name>, The (<brand>) (19xx)"` → `"The <name>"`.
    */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val titled = Tables.part(s, dir).select(
      col("p_partkey"),
      concat(col("p_name"), lit(", The ("), col("p_brand"), lit(") ("),
        (lit(1900) + col("p_size")).cast("string"), lit(")")).as("title"))
    titled.select(
      col("p_partkey"),
      TextFunctions.normalizeTitle(col("title")).as("norm_title"))
      .orderBy(col("p_partkey"))
  }

  // DuckDB mirror of the exact normalizeTitle step sequence; Spark's
  // regexp_replace is replace-all, so every DuckDB step carries the 'g'
  // flag, and backreferences are \n instead of $n.
  private val q15Sql =
    """SELECT p_partkey,
      |  regexp_replace(trim(
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(trim(
      |          regexp_replace(trim(title), '\s*\([^)]*\)', '', 'g')),
      |          '\s+', ' ', 'g'),
      |        '^[, ]+|[, ]+$', '', 'g'),
      |      '^(.*), (The|A|An|Le|La|Les)$', '\2 \1')),
      |    '\s+', ' ', 'g') AS norm_title
      |FROM (SELECT p_partkey,
      |        p_name || ', The (' || p_brand || ') (' || CAST(1900 + p_size AS VARCHAR) || ')' AS title
      |      FROM part)
      |ORDER BY p_partkey""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q14_year_extraction", q14, Some(q14Sql)),
    QuerySpec("q15_title_normalization", q15, Some(q15Sql)))
}
