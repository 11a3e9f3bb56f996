package graft.tools

import graft.LocalCatalog
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-key → posting-bucket fan-in measurement (round-16,
  * VERDICT item 2 — measure BEFORE building the posting-count
  * bucket-skip).
  *
  * The frozen advance's wall floor is `ckpt_inter_pruned`: the A×B
  * candidate join semi-joins the FULL s-bucketed posting table against
  * the batch's capped candidate shingle keys — a corpus-linear scan.
  * The untried idea was to SKIP posting buckets that contain no
  * candidate key. This main measures whether any bucket is skippable:
  * it derives the advance's candidate keys exactly as the advance does
  * (the daily mod-split batch's distinct hashed shingles — a subset of
  * the advance's candKeys = dfB ∪ shAOld, so the measured fan-in is a
  * LOWER bound) and reports, for every plausible bucket count B, the
  * fraction of buckets hit by ≥1 candidate key — using Spark's own
  * bucket-id arithmetic (pmod(murmur3(s), B), the HashPartitioning
  * expression bucketed writes use). Hit rate ≈ 1.0 at every B means
  * no bucket is ever skippable and the idea is closed by measurement,
  * not by assumption; the expected coverage 1−(1−1/B)^k is printed
  * alongside as the sanity twin.
  */
object FanInRung {
  def main(args: Array[String]): Unit = {
    LocalCatalog.reset()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/benchdata/sf30")
    val mod = sys.env.getOrElse("SPARK_GRAFT_ADV_MOD", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val batch = docs.filter(pmod(col("doc_id"), lit(mod)) === 0)
    val keys = Dedup.shingles(batch, "doc_id", "text", 3)
      .select(xxhash64(col("s")).as("s")).distinct()
      .persist()
    val k = keys.count()
    // the bucket ladder: every power of two in autoBuckets' [32, 4096]
    // clamp, so the verdict holds for any index the sizing rule builds
    val ladder = Seq(32, 64, 128, 256, 512, 1024, 2048, 4096)
    val hitCols = ladder.map(b =>
      countDistinct(pmod(hash(col("s")), lit(b))).as(s"b$b"))
    val hits = keys.agg(hitCols.head, hitCols.tail: _*).collect()(0)
    val parts = ladder.zipWithIndex.map { case (b, i) =>
      val hit = hits.getLong(i)
      val expected = 1.0 - math.pow(1.0 - 1.0 / b, k.toDouble)
      f"""{"buckets":$b,"hit":$hit,"hit_rate":${hit.toDouble / b}%.6f,"expected":$expected%.6f}"""
    }
    println(s"""{"metric":"bucket_fanin","sf":"$sfDir","mod":$mod,""" +
      s""""candidate_keys":$k,"ladder":[${parts.mkString(",")}]}""")
    keys.unpersist()
    spark.stop()
  }
}
