package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Try

/** S1-S3: CSV sources (SURVEY.md §2.1). RFC-4180 quoting handles the
  * 2,080 embedded-comma titles; PERMISSIVE mode turns malformed
  * numerics into nulls (pandas-coerce parity).
  */
object Extract {

  private def csv(spark: SparkSession, path: String,
                  schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      // RFC-4180 escapes a quote by DOUBLING it; Spark's univocity
      // default escape is backslash, which left movie 7789's
      // `"11'09""01 - September 11 (2002)"` as the raw quoted field
      // (caught round-16 by the Q6 full-result pin — the reference's
      // pandas reader unescapes it, doublequote=True being its default)
      .option("escape", "\"")
      .schema(schema)
      .csv(path)

  /** S1: movies.csv. */
  def movies(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, Schemas.movies)

  /** S2: ratings.csv. */
  def ratings(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, Schemas.ratings)

  /** S3: links.csv — missing-file tolerant: absent file degrades to an
    * empty typed table and the pipeline continues (etl1.py:59-64). */
  def links(spark: SparkSession, path: String): DataFrame =
    Try {
      val df = csv(spark, path, Schemas.links)
      df.queryExecution.analyzed // force path resolution now
      df
    }.getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.links))
}
