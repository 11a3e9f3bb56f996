package graft.queries

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  * e01 is the exact brute-force baseline with a full DuckDB mirror
  * (scaled-integer dot products make even the float math oracle-exact);
  * e02 is the LSH-bucketed ANN scale path — approximate by construction,
  * so it gets the driver's rows-only check, and its recall is measured
  * against e01 in the test suite.
  */
object VectorQueries {

  private val K = 5
  private val QueryPred = col("vec_id") < 10

  /** Brute-force cosine top-5 for query vectors vec_id < 10 (e01). */
  private def e01(s: SparkSession, dir: String): DataFrame =
    Similarity.knnExact(Tables.embeddings(s, dir), QueryPred, K)
      .orderBy(col("qid"), col("rank"))

  private val e01Sql =
    """WITH idx AS (SELECT unnest(range(1, 65)) AS i),
      |e AS (SELECT vec_id, embedding FROM embeddings),
      |norms AS (
      | SELECT vec_id,
      |   CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) * 1e12, 0) AS BIGINT)) AS BIGINT) AS n2
      | FROM e CROSS JOIN idx GROUP BY vec_id),
      |dots AS (
      | SELECT q.vec_id AS qid, c.vec_id AS vid,
      |   CAST(SUM(CAST(ROUND(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) * 1e12, 0) AS BIGINT)) AS BIGINT) AS dot_e12
      | FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
      | CROSS JOIN idx
      | GROUP BY 1, 2),
      |scored AS (
      | SELECT qid, vid,
      |   CAST(dot_e12 AS DOUBLE) / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE))) AS cos
      | FROM dots JOIN norms qn ON qid = qn.vec_id JOIN norms cn ON vid = cn.vec_id)
      |SELECT qid, rank, vid, round(cos, 6) AS cos_r6
      |FROM (SELECT qid, vid, cos,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS BIGINT) AS rank
      |      FROM scored)
      |WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  /** LSH-bucketed ANN, same queries (e02) — no SQL oracle (approximate
    * candidate generation); rows-only check + recall test vs e01. */
  private def e02(s: SparkSession, dir: String): DataFrame =
    Similarity.annLsh(Tables.embeddings(s, dir), QueryPred, K, planes = 4)
      .orderBy(col("qid"), col("rank"))

  /** Embedding-cosine near-dup (e03): globally top-20 most-similar
    * pairs, exact all-pairs baseline (swap candidates for LSH at
    * corpus scale). */
  private def e03(s: SparkSession, dir: String): DataFrame =
    Similarity.topSimilarPairs(Tables.embeddings(s, dir), 20)
      .orderBy(col("cos_r6").desc, col("v1"), col("v2"))

  private val e03Sql =
    """WITH idx AS (SELECT unnest(range(1, 65)) AS i),
      |e AS (SELECT vec_id, embedding FROM embeddings),
      |norms AS (
      | SELECT vec_id,
      |   CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) * 1e12, 0) AS BIGINT)) AS BIGINT) AS n2
      | FROM e CROSS JOIN idx GROUP BY vec_id),
      |dots AS (
      | SELECT a.vec_id AS v1, b.vec_id AS v2,
      |   CAST(SUM(CAST(ROUND(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) * 1e12, 0) AS BIGINT)) AS BIGINT) AS dot_e12
      | FROM e a JOIN e b ON a.vec_id < b.vec_id
      | CROSS JOIN idx
      | GROUP BY 1, 2)
      |SELECT v1, v2, round(cos, 6) AS cos_r6
      |FROM (SELECT v1, v2,
      |        CAST(dot_e12 AS DOUBLE) / (sqrt(CAST(n1.n2 AS DOUBLE)) * sqrt(CAST(n2.n2 AS DOUBLE))) AS cos
      |      FROM dots JOIN norms n1 ON v1 = n1.vec_id JOIN norms n2 ON v2 = n2.vec_id)
      |ORDER BY cos DESC, v1 ASC, v2 ASC
      |LIMIT 20""".stripMargin

  /** IVF-flat ANN, same queries (e04) — rows-only check like e02; its
    * exhaustive-probe equivalence to e01 is pinned in the test suite. */
  private def e04(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val index = graft.operators.Ivf.build(emb, k = 16, iters = 2)
    graft.operators.Ivf.search(index, emb.filter(QueryPred), K, nprobe = 4)
      .orderBy(col("qid"), col("rank"))
  }

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("e01_knn_exact", e01, Some(e01Sql)),
    QuerySpec("e02_ann_lsh", e02, None),
    QuerySpec("e03_cosine_neardup", e03, Some(e03Sql)),
    QuerySpec("e04_ann_ivf", e04, None))
}
