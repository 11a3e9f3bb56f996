package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-flat approximate nearest neighbor — the second scale path next
  * to LSH (builder prompt: "an IVF or LSH-bucketed variant"). Pure
  * DataFrame ops end to end:
  *
  *  - build: deterministic seed centroids (k vectors with the smallest
  *    md5(vec_id) — reproducible, no RNG state), refined with Lloyd
  *    iterations where assignment is a broadcast cross join against the
  *    k centroids (k ≪ N, so the join is N×k with a tiny broadcast
  *    side) and recomputation is a posexplode → per-dimension mean →
  *    re-assembled array.
  *  - search: score queries against centroids, take the top `nprobe`
  *    cells per query, and scan only those cells' vectors — the
  *    candidate set shrinks ~k/nprobe-fold vs brute force while the
  *    exact native dot product re-ranks candidates.
  *
  * At corpus scale the assigned table is written bucketed by cell id,
  * so a probe reads only its cells' buckets.
  */
object Ivf {

  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame)

  private def bestCell(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val sim = Similarity.cosineFromE12(
      Similarity.dotE12(col("embedding"), col("centroid")),
      Similarity.norm2E12(col("embedding")),
      Similarity.norm2E12(col("centroid")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("__sim").desc, col("cell_id").asc)
    vectors.crossJoin(broadcast(centroids))
      .withColumn("__sim", sim)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell_id"))
  }

  /** Build an index with k cells and `iters` Lloyd refinements. */
  def build(emb: DataFrame, k: Int, iters: Int = 2): IvfIndex = {
    val seedW = Window.orderBy(col("__h"))
    var centroids = emb
      .withColumn("__h", md5(col("vec_id").cast("string")))
      .orderBy(col("__h")).limit(k)
      .withColumn("cell_id", row_number().over(seedW).cast("int"))
      .select(col("cell_id"), col("embedding").as("centroid"))

    for (_ <- 0 until iters) {
      val assigned = bestCell(emb, centroids)
      // exact scaled-integer mean (sum of e12 longs / count): avg() on
      // doubles is reduction-order dependent, which would make centroids
      // — and therefore cell assignments — vary with partitioning,
      // breaking the module's determinism contract.
      centroids = assigned
        .select(col("cell_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("cell_id"), col("pos"),
          round(col("v").cast("double") * lit(1.0e12), 0).cast("long").as("v12"))
        .groupBy(col("cell_id"), col("pos"))
        .agg(sum(col("v12")).as("s12"), count(lit(1)).as("n"))
        .withColumn("m",
          col("s12").cast("double") / col("n").cast("double") / lit(1.0e12))
        .groupBy(col("cell_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m").cast("float")).as("centroid"))
    }
    IvfIndex(centroids, bestCell(emb, centroids))
  }

  /** Top-k per query scanning only the `nprobe` best cells. */
  def search(index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val qSim = Similarity.cosineFromE12(
      Similarity.dotE12(col("qe"), col("centroid")),
      Similarity.norm2E12(col("qe")),
      Similarity.norm2E12(col("centroid")))
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(col("__sim").desc, col("cell_id").asc)
    val probes = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(index.centroids))
      .withColumn("__sim", qSim)
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("qe"), col("cell_id"))

    val candidates = probes
      .withColumn("qn", Similarity.norm2E12(col("qe")))
      .join(index.assigned.withColumnRenamed("vec_id", "vid")
        .withColumnRenamed("embedding", "ce"), Seq("cell_id"))
      .filter(col("qid") =!= col("vid"))
      .withColumn("cn", Similarity.norm2E12(col("ce")))
    Similarity.rankTopK(candidates, k)
  }
}
