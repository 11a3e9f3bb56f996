package graft.tools

import graft.{LocalCatalog, Telemetry}
import graft.operators.PairIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Self-triggered compaction rung (round-16, VERDICT item 3): a chain
  * of frozen advances run with `autoCompactMaxFiles` set — NO manual
  * compactDocIndex call anywhere — recording per advance:
  *   - whether the advance's own compactDue check fired
  *     (pairindex.advance_autocompact telemetry);
  *   - the worst files/bucket across the four artifacts AFTER the
  *     advance (must stay ≤ the bound);
  *   - one consumer-suite wall (the d28 curation tail + droplist
  *     distinct — the read-amplification-sensitive shapes).
  * The claim under test: a long daily chain keeps its consumers at
  * bounded read amplification with the trigger alone, and consumer
  * wall RECOVERS at each firing instead of degrading monotonically
  * the way the r15 CompactRung measured for an uncompacted chain
  * (0.68→1.35 s over 5 appends at sf1).
  */
object AutoCompactRung {
  def main(args: Array[String]): Unit = {
    LocalCatalog.reset()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/benchdata/sf1")
    val mod = sys.env.getOrElse("SPARK_GRAFT_ADV_MOD", "64").toInt
    val advances = sys.env.getOrElse("SPARK_GRAFT_COMPACT_ADVANCES", "10").toInt
    val bound = sys.env.getOrElse("SPARK_GRAFT_COMPACT_MAXFILES", "3.0").toDouble
    require(advances < mod,
      s"advances=$advances must be < mod=$mod — batch k matches " +
        "pmod(doc_id, mod) == k, so k >= mod selects NO docs and the rung " +
        "would silently record no-op advances as data points")
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

    var idx = PairIndex.materializeDocIndex(
      docs.filter(pmod(col("doc_id"), lit(mod)) === 0 ||
        pmod(col("doc_id"), lit(mod)) > advances),
      "doc_id", "text", keepPostings = true)

    def worstFpb(i: PairIndex.DocIndex): Double =
      (Seq(i.survivorsTable, i.pairsTable) ++ i.postingsTable ++ i.dfTable)
        .map(PairIndex.filesPerBucket(spark, _)).max
    def consume(i: PairIndex.DocIndex): Double = {
      val t0 = System.nanoTime()
      PairIndex.curateFromIndex(spark, i, "doc_id", "text")
        .groupBy(col("split")).agg(count(lit(1))).collect()
      val cc = spark.table(i.pairsTable).select(col("doc_id2")).distinct().count()
      assert(cc >= 0)
      (System.nanoTime() - t0) / 1e9
    }

    val steps = (1 to advances).map { k =>
      Telemetry.drain()
      val t0 = System.nanoTime()
      val adv = PairIndex.advanceDocIndex(spark, idx,
        docs.filter(pmod(col("doc_id"), lit(mod)) === k), "doc_id", "text",
        frozenCaps = true, autoCompactMaxFiles = bound)
      val wallAdv = (System.nanoTime() - t0) / 1e9
      val fired = Telemetry.drain().getOrElse("pairindex.advance_autocompact", 0L)
      PairIndex.dropSuperseded(spark, idx, adv.idx)
      idx = adv.idx
      val fpb = worstFpb(idx)
      val wallCons = consume(idx)
      println(f"[autocompact] adv=$k fired=$fired fpb=$fpb%.2f " +
        f"adv_wall=$wallAdv%.2fs consumer_wall=$wallCons%.2fs")
      (k, fired, fpb, wallAdv, wallCons)
    }
    val fires = steps.count(_._2 > 0)
    val worst = steps.map(_._3).max
    val stepJson = steps.map { case (k, f, fpb, wa, wc) =>
      s"""{"advance":$k,"fired":$f,"worst_files_per_bucket":${fmt(fpb)},""" +
        s""""advance_wall_sec":${fmt(wa)},"consumer_wall_sec":${fmt(wc)}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"autocompact_rung","sf":"$sfDir","mod":$mod,""" +
      s""""advances":$advances,"bound":$bound,"fires":$fires,""" +
      s""""worst_files_per_bucket":${fmt(worst)},"steps":$stepJson}""")
    println(s"AUTOCOMPACTRUNG OK fires=$fires worst_fpb=${fmt(worst)} bound=$bound")
    PairIndex.dropDocIndex(spark, idx)
    spark.stop()
  }
}
