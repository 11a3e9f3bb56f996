package graft.tools

import graft.{LocalCatalog, Telemetry}
import graft.operators.PairIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compaction economics rung (round-15, VERDICT item 2): what does the
  * append-accumulated file fragmentation of a standing index COST its
  * consumers, and what does `compactDocIndex` buy back?
  *
  * Protocol, per run (one session, same window):
  *  1. materialize the standing four-artifact index on a mod-split
  *     corpus slice;
  *  2. chain N frozen advances (the daily path) — each appends one file
  *     set per bucket to survivors/postings/df (pairs too on flip-free
  *     days);
  *  3. time the consumer suite on the FRAGMENTED index (curation
  *     droplist + anti join, cluster assignment sizes — the d28/d29
  *     shapes), runs×;
  *  4. `compactDocIndex` (timed), then the same consumer suite on the
  *     COMPACTED index, runs×;
  *  5. record files/bucket before and after for all four artifacts.
  *
  * The before/after consumer walls are same-window adjacent; the
  * before leg runs first, so page-cache warming favors the AFTER leg —
  * runs≥2 with per-run numbers recorded lets the reader judge (run 1
  * of each leg is the cold one).
  */
object CompactRung {
  def main(args: Array[String]): Unit = {
    LocalCatalog.reset()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/benchdata/sf1")
    val mod = sys.env.getOrElse("SPARK_GRAFT_ADV_MOD", "64").toInt
    val advances = sys.env.getOrElse("SPARK_GRAFT_COMPACT_ADVANCES", "5").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AUTO_BROADCAST", "-1"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_ADAPTIVE_BROADCAST", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "30s"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    def docs = graft.sources.Tables.documents(spark, sfDir)
    def fmt(v: Double) = f"$v%.4f"

    // standing index on the base slices, advanced with `advances`
    // distinct daily batches (slices 1..advances of the mod split)
    var idx = PairIndex.materializeDocIndex(
      docs.filter(pmod(col("doc_id"), lit(mod)) === 0 ||
        pmod(col("doc_id"), lit(mod)) > advances),
      "doc_id", "text", keepPostings = true)
    (1 to advances).foreach { k =>
      val adv = PairIndex.advanceDocIndex(spark, idx,
        docs.filter(pmod(col("doc_id"), lit(mod)) === k), "doc_id", "text",
        frozenCaps = true)
      PairIndex.dropSuperseded(spark, idx, adv.idx)
      idx = adv.idx
    }

    def fpb(i: PairIndex.DocIndex): Map[String, Double] = Map(
      "survivors" -> PairIndex.filesPerBucket(spark, i.survivorsTable),
      "pairs" -> PairIndex.filesPerBucket(spark, i.pairsTable),
      "postings" -> PairIndex.filesPerBucket(spark, i.postingsTable.get),
      "df" -> PairIndex.filesPerBucket(spark, i.dfTable.get))
    // the d28/d29 consumer shapes: curation tail + cluster sizes
    def consume(i: PairIndex.DocIndex): Seq[Double] = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      PairIndex.curateFromIndex(spark, i, "doc_id", "text")
        .groupBy(col("split")).agg(count(lit(1))).collect()
      val cc = spark.table(i.pairsTable)
        .select(col("doc_id2")).distinct().count()
      assert(cc >= 0)
      (System.nanoTime() - t0) / 1e9
    }

    val fpbBefore = fpb(idx)
    val before = consume(idx)
    val t0 = System.nanoTime()
    Telemetry.drain()
    val compacted = PairIndex.compactDocIndex(spark, idx, "doc_id")
    val wallCompact = (System.nanoTime() - t0) / 1e9
    val tel = Telemetry.drain()
    PairIndex.dropSuperseded(spark, idx, compacted)
    val fpbAfter = fpb(compacted)
    val after = consume(compacted)
    PairIndex.dropDocIndex(spark, compacted)

    def mp(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":${fmt(v)}""" }
        .mkString("{", ",", "}")
    def arr(v: Seq[Double]) = v.map(fmt).mkString("[", ",", "]")
    val telJson = tel.toSeq.sortBy(_._1)
      .map { case (m, v) => "\"" + m + "\":" + v }.mkString("{", ",", "}")
    println(f"[compact] advances=$advances compact=${wallCompact}%.1fs " +
      f"before=${before.min}%.2f-${before.max}%.2fs after=${after.min}%.2f-${after.max}%.2fs " +
      s"fpb ${mp(fpbBefore)} -> ${mp(fpbAfter)}")
    println(s"""{"metric":"compact_rung","sf":"$sfDir","mod":$mod,""" +
      s""""advances":$advances,"consumer_runs":$runs,""" +
      s""""files_per_bucket_before":${mp(fpbBefore)},""" +
      s""""files_per_bucket_after":${mp(fpbAfter)},""" +
      s""""consumer_wall_before_sec":${arr(before)},""" +
      s""""consumer_wall_after_sec":${arr(after)},""" +
      s""""compact_wall_sec":${fmt(wallCompact)},""" +
      s""""compact_telemetry":$telJson}""")
    println(s"COMPACTRUNG OK advances=$advances")
    spark.stop()
  }
}
