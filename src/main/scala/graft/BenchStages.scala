package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-attribution probe (round-9 VERDICT item 2): times named
  * SUB-PLANS of the d12 curation composition at one SF dir, so decade
  * growth can be ATTRIBUTED to a stage with numbers instead of guessed
  * from the whole-query wall time. Each stage is cumulative (it
  * re-executes its upstream stages — Spark has no per-operator timer
  * that survives whole-stage codegen), so per-stage cost is the DELTA
  * between adjacent rows, and the deltas at two SFs give the per-stage
  * growth. Protocol matches Bench: noop sink, median of runs,
  * clearCache between runs, same session config.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchStages"
  */
object BenchStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AUTO_BROADCAST", "-1"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_ADAPTIVE_BROADCAST", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    import graft.operators.{Components, CorpusPipeline, Dedup, TextAnalysis}
    def docs = graft.sources.Tables.documents(spark, sfDir)
    def exact = Dedup.dropExactDuplicates(docs, "doc_id", "text")
    def pairs = Dedup.jaccardPairs(
      Dedup.shingles(exact, "doc_id", "text", 3), 0.6, 100)
    def droplist = pairs.select(col("doc_id2").as("doc_id")).distinct()
    def anti = exact.hint("merge").join(droplist, Seq("doc_id"), "left_anti")
    def full = CorpusPipeline.curate(docs)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"))

    // d18 composition (round-10 VERDICT item 1): pairs over the RAW
    // docs (no exact-dedup prefix — d18 registers the full near-dup
    // universe), then connected components, then the size join and the
    // registered query's global sort. Components' internal phases are
    // additionally attributed by the inline telemetry timers in
    // Components.minLabel; this ladder pins where the WHOLE query's
    // decade growth lives (pair gen vs cc vs tail).
    def d18pairs = Dedup.jaccardPairs(
      Dedup.shingles(docs, "doc_id", "text", 3), 0.6, 100)
    def d18cc = Components.connectedComponents(d18pairs, "doc_id1", "doc_id2")
    def d18sized = {
      val cc = d18cc
      cc.join(cc.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size")), "lbl")
        .select(col("v").as("doc_id"), col("lbl").as("cluster_rep"),
          col("cluster_size"))
    }
    def d18full = d18sized.orderBy(col("doc_id"))

    // cumulative ladder: each row adds one stage of the composition
    val d12Stages: Seq[(String, () => DataFrame)] = Seq(
      "s1_exact_dedup" -> (() => exact),
      "s2_jaccard_pairs" -> (() => pairs),
      "s3_droplist_distinct" -> (() => droplist),
      "s4_anti_join" -> (() => anti),
      "s5_full_curate_agg" -> (() => full))
    val d18Stages: Seq[(String, () => DataFrame)] = Seq(
      "s1_jaccard_pairs" -> (() => d18pairs),
      "s2_connected_components" -> (() => d18cc),
      "s3_size_join" -> (() => d18sized),
      "s4_full_sorted" -> (() => d18full))
    val ladder = sys.env.getOrElse("SPARK_GRAFT_STAGES", "d12")
    val stages = if (ladder == "d18") d18Stages else d12Stages

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val out = stages.map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
        try {
          fn().write.mode("overwrite").format("noop").save()
          Some(((System.nanoTime() - t0) / 1e9,
            (osBean.getProcessCpuTime - c0) / 1e9))
        } catch { case e: Throwable =>
          System.err.println(s"[stages] $name failed: ${e.getMessage}"); None
        }
      }
      def med(xs: Seq[Double]) =
        if (xs.isEmpty) -1.0 else xs.sorted.apply((xs.size - 1) / 2)
      (name, med(times.map(_._1)), med(times.map(_._2)))
    }
    def fmt(v: Double) = f"$v%.4f"
    val walls = out.map { case (k, w, _) => "\"" + k + "\":" + fmt(w) }
      .mkString("{", ",", "}")
    val cpu = out.map { case (k, _, c) => "\"" + k + "\":" + fmt(c) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"${ladder}_stages","sf":"$sfDir","runs":$runs,"cpu_sec":$cpu,"wall":$walls}""")
    spark.stop()
  }
}
