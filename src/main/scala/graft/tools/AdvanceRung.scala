package graft.tools

import graft.{LocalCatalog, Telemetry}
import graft.operators.PairIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DIRECT advance-vs-rebuild measurement (round-14, VERDICT item 5).
  *
  * The BenchStages `advidx` ladder measures the advance by SUBTRACTION
  * (a2f − a1: two independent rungs that each rematerialize the
  * corpus index). At sf30 that is structurally broken: the materialize
  * wall is ~400 s with ±5% same-window variance, while the frozen
  * advance itself is ~20 s — the subtraction's noise floor exceeds the
  * quantity measured, which is how r13's rung produced a NEGATIVE
  * advance wall and r14's runs=2 retry produced another. This main
  * times each operation directly instead:
  *
  *   per run: materialize corpus (mod-split != 0, timed) →
  *            advance the 1/mod batch IN THAT SESSION (timed alone) →
  *            rebuild the combined corpus from scratch (timed) — the
  *            bar the advance must beat AND the audit-cadence cost.
  *
  * No subtraction anywhere; the advance's per-phase telemetry is
  * recorded alongside so the direct wall can be cross-checked against
  * the phase sum (they should agree within checkpoint/SQL-overhead
  * slack). An advance mutates the standing index, so every run
  * rematerializes — runs are whole-loop repeats in one window.
  */
object AdvanceRung {
  def main(args: Array[String]): Unit = {
    LocalCatalog.reset()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mod = sys.env.getOrElse("SPARK_GRAFT_ADV_MOD", "64").toInt
    val frozen = !sys.env.get("SPARK_GRAFT_ADV_FROZEN").contains("0")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val inputBytes = {
      val root = java.nio.file.Paths.get(sfDir)
      val walk = java.nio.file.Files.walk(root)
      try walk.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally walk.close()
    }
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val initialParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      math.min(1024L, math.max(cpus.toLong, inputBytes * 8 / (64L << 20))).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initialParts)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AUTO_BROADCAST", "-1"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_ADAPTIVE_BROADCAST", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "2min"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    def docs = graft.sources.Tables.documents(spark, sfDir)
    def jstr(s: String) = "\"" + s + "\""
    def fmt(v: Double) = f"$v%.4f"

    val rows = (1 to runs).map { run =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val idx = PairIndex.materializeDocIndex(
        docs.filter(pmod(col("doc_id"), lit(mod)) =!= 0), "doc_id", "text",
        keepPostings = true)
      val wallMat = (System.nanoTime() - t0) / 1e9
      Telemetry.drain()
      val t1 = System.nanoTime()
      val adv = PairIndex.advanceDocIndex(spark, idx,
        docs.filter(pmod(col("doc_id"), lit(mod)) === 0), "doc_id", "text",
        frozenCaps = frozen)
      val wallAdv = (System.nanoTime() - t1) / 1e9
      val tel = Telemetry.drain()
      PairIndex.dropSuperseded(spark, idx, adv.idx)
      PairIndex.dropDocIndex(spark, adv.idx)
      val t2 = System.nanoTime()
      val full = PairIndex.materializeDocIndex(docs, "doc_id", "text",
        keepPostings = true)
      val wallRebuild = (System.nanoTime() - t2) / 1e9
      PairIndex.dropDocIndex(spark, full)
      val phaseSum = tel.collect {
        case (k, v) if k.startsWith("pairindex.advance_ms_") => v
      }.sum / 1000.0
      println(f"[advrung] run=$run mat=${wallMat}%.1fs adv=${wallAdv}%.1fs " +
        f"(phases ${phaseSum}%.1fs) rebuild=${wallRebuild}%.1fs " +
        f"ratio=${wallAdv / wallRebuild}%.4f")
      val telJson = tel.toSeq.sortBy(_._1)
        .map { case (m, v) => jstr(m) + ":" + v }.mkString("{", ",", "}")
      s"""{"run":$run,"materialize_wall_sec":${fmt(wallMat)},
         |"advance_wall_sec":${fmt(wallAdv)},
         |"advance_phase_sum_sec":${fmt(phaseSum)},
         |"rebuild_wall_sec":${fmt(wallRebuild)},
         |"advance_vs_rebuild_wall":${fmt(wallAdv / wallRebuild)},
         |"telemetry":$telJson}""".stripMargin.replaceAll("\n", "")
    }
    println(s"""{"metric":"advance_rung","sf":"$sfDir","mod":$mod,""" +
      s""""frozen":$frozen,"runs":$runs,"measurements":[${rows.mkString(",")}]}""")
    println(s"ADVRUNG OK runs=$runs frozen=$frozen")
    spark.stop()
  }
}
