package graft.queries

import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible correctness for the multimodal plumbing (m01): the
  * `documents.text` payloads cast to an opaque binary column run
  * through the real mapPartitions decode path (one decoder per
  * partition, streaming iterator), producing the typed MediaMeta
  * columns. Only the codec inside `decodeStub` is fake — and it is
  * deterministic (an FNV-ish byte fold), so the whole operator has an
  * exact DuckDB mirror: md5 over the same bytes for the fingerprint,
  * and the fold replayed in HUGEINT arithmetic mod 2^64 (Java's
  * wrapping long semantics; the >>10 / >>20 signed shifts reduce to
  * unsigned division because 2^64 is divisible by the moduli). The
  * corpus is ASCII (pinned by d09's codepoint oracle), so byte values
  * equal `ascii()` codes on the SQL side.
  */
object MultimodalQueries {

  private def m01(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractMeta(
      s,
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload")),
      "doc_id", "payload", kind = "text")
      .toDF()
      .orderBy(col("media_id"))

  private val m01Sql =
    """SELECT doc_id AS media_id, 'text' AS kind,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  CAST(64 + u % 1024 AS INTEGER) AS width,
      |  CAST(64 + (u // 1024) % 1024 AS INTEGER) AS height,
      |  CAST(1 + (u // 1048576) % 32 AS INTEGER) AS n_frames,
      |  md5(text) AS fingerprint
      |FROM (SELECT doc_id, text,
      |        list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
      |          list_transform(string_split_regex(text, ''), ch -> CAST(ascii(ch) AS HUGEINT))),
      |          (acc, x) -> (acc * 31 + x) % CAST('18446744073709551616' AS HUGEINT)) AS u
      |      FROM documents)
      |ORDER BY media_id""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("m01_media_meta", m01, Some(m01Sql)))
}
