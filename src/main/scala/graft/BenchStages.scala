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
    LocalCatalog.reset() // Derby/warehouse are per-session scratch (round-13)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // session config mirrors Bench exactly (input-scaled AQE initial
    // partitions, runtime-only broadcasts, bounded shuffle scratch) so
    // stage deltas are attributable to the same plans Bench times
    val inputBytes = {
      val root = java.nio.file.Paths.get(sfDir)
      val walk = java.nio.file.Files.walk(root)
      try walk.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally walk.close()
    }
    // SPARK_GRAFT_SHUFFLE_PARTITIONS pins BOTH knobs, exactly as in
    // Bench — without the first line an env-pinned A/B between Bench
    // and BenchStages would silently run different shuffle configs
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

    // q32 skew A/B (round-10 VERDICT item 5): the same hot-key join
    // three ways on a skewed events fixture (GenSkew) — naive shuffle
    // join with AQE skew mitigation OFF (what a plain plan does),
    // unsalted with AQE skew-join ON (what the session default gives),
    // and the registered salted plan. Each thunk re-runs per
    // measurement, so the conf toggle inside it applies to that run.
    def q32variant(salted: Boolean, skewOpt: Boolean) = () => {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOpt.toString)
      val ev = graft.sources.Tables.events(spark, sfDir)
      val dim = ev.select(col("event_type")).distinct()
        .withColumn("w", length(col("event_type")).cast("long"))
      val joined =
        if (salted)
          graft.operators.Salting.saltedJoin(ev, dim.hint("shuffle_hash"),
            "event_type", salt = 8)
        else ev.join(dim.hint("shuffle_hash"), Seq("event_type"))
      joined.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(graft.functions.ExactNum.cents(col("value")) * col("w"))
            .as("wsum_cents"))
        .orderBy(col("event_type"))
    }
    val q32Stages: Seq[(String, () => DataFrame)] = Seq(
      "s1_unsalted_noskewopt" -> q32variant(salted = false, skewOpt = false),
      "s2_unsalted_aqe_skew" -> q32variant(salted = false, skewOpt = true),
      "s3_salted" -> q32variant(salted = true, skewOpt = true))

    // d12 droplist-tail alternatives (round-10 VERDICT item 3): the
    // attributed residual is droplist-distinct + anti-join. The merge
    // hint there predates the round-9 adaptive-broadcast policy — with
    // static broadcasts OFF and AQE's runtime 8m threshold, an
    // UNhinted anti join lets AQE upgrade to broadcast from the REAL
    // materialized droplist size (a few MB of longs), cliff-free
    // (outgrows 8m → stays sort-merge). The distinct is also
    // correctness-optional for an anti join (dup probe keys change
    // nothing), so measure dropping it too.
    def d12variant(hint: Option[String], distinct: Boolean) = () => {
      val exact = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      val dl0 = Dedup.jaccardPairs(
          Dedup.shingles(exact, "doc_id", "text", 3), 0.6, 100)
        .select(col("doc_id2").as("doc_id"))
      val dl = if (distinct) dl0.distinct() else dl0
      val left = hint.fold(exact)(exact.hint(_))
      left.join(dl, Seq("doc_id"), "left_anti")
        .filter(TextAnalysis.langIdHeuristic(col("text")) === "en")
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.3)
        .withColumn("split",
          TextAnalysis.hashSplit(TextAnalysis.textHash(col("text"))))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"))
    }
    val d12AltStages: Seq[(String, () => DataFrame)] = Seq(
      "s1_merge_distinct" -> d12variant(Some("merge"), distinct = true),
      "s2_nohint_distinct" -> d12variant(None, distinct = true),
      "s3_nohint_nodistinct" -> d12variant(None, distinct = false))

    // shared-pair-index A/B (round-11 VERDICT item 2): the suite's four
    // pair-consuming queries each recompute candidate-pair generation
    // (96-98% of their wall). The from-index protocol materializes the
    // survivors + pair index ONCE (s5/s9) and the consumers join the
    // bucketed artifacts. Compare sum(s1..s4) against sum(s5..s10).
    // Universe note: the from-index cluster queries run over the
    // exact-dedup survivor universe (the protocol a real pipeline uses
    // — clustering exact duplicates is pointless), so s7/s8 are the
    // survivor-universe twins of the raw-docs registered queries;
    // s6 (d12) is row-identical to s1 and oracle-pinned via d28.
    import graft.operators.PairIndex
    def registered(name: String) = () => SparkEntry.queries(name)(spark, sfDir)
    val bIdx = PairIndex.DocIndex("bpi_survivors", "bpi_pairs")
    val pairIdxStages: Seq[(String, () => DataFrame)] = Seq(
      "s1_d12_recompute" -> registered("d12_corpus_curation"),
      "s2_d18_recompute" -> registered("d18_dup_clusters"),
      "s3_d21_recompute" -> registered("d21_cluster_curation"),
      "s4_e07_recompute" -> registered("e07_embed_dup_clusters"),
      // ADVICE r11: the from-index cluster consumers (s7/s8) run over
      // the exact-dedup SURVIVOR universe while the registered queries
      // (s2/s3) run over raw docs — these twins recompute the
      // consumers' exact workload from scratch so the headline
      // recompute-vs-index ratio has apples-to-apples arms (s2/s3 stay
      // under their r11 names for cross-round comparability)
      "s2b_d18_recompute_surv" -> (() => {
        val pairs = Dedup.jaccardPairs(
          Dedup.shingles(exact, "doc_id", "text", 3), 0.6, maxDocFreq = 100)
        val cc = Components.connectedComponents(pairs, "doc_id1", "doc_id2")
        cc.hint("merge")
          .join(cc.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size")), "lbl")
          .select(col("v").as("doc_id"), col("lbl").as("cluster_rep"),
            col("cluster_size"))
          .orderBy(col("doc_id"))
      }),
      "s3b_d21_recompute_surv" -> (() => {
        import org.apache.spark.sql.expressions.Window
        val pairs = Dedup.jaccardPairs(
          Dedup.shingles(exact, "doc_id", "text", 3), 0.6, maxDocFreq = 100)
        val cc = Components.connectedComponents(pairs, "doc_id1", "doc_id2")
        val scores = graft.operators.LmScore.score(exact, "doc_id", "text")
          .select(col("doc_id"), (col("sum_nlp_micro").cast("double")
            / col("n_tokens").cast("double")).as("__score"))
        val sized = cc.hint("merge")
          .join(cc.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size")), "lbl")
        val best = sized.join(scores, sized("v") === scores("doc_id"))
          .withColumn("__rk", row_number().over(
            Window.partitionBy(col("lbl")).orderBy(col("__score"), col("v"))))
          .filter(col("__rk") === 1)
          .select(col("v").as("doc_id"), col("lbl").as("cluster_rep"),
            col("cluster_size"), lit("best_in_cluster").as("kept_reason"))
        val singletons = exact.select(col("doc_id"))
          .join(cc, exact("doc_id") === cc("v"), "left_anti")
          .select(col("doc_id"), col("doc_id").as("cluster_rep"),
            lit(1L).as("cluster_size"), lit("singleton").as("kept_reason"))
        best.unionByName(singletons).orderBy(col("doc_id"))
      }),
      "s5_materialize_doc_index" -> (() => {
        PairIndex.materializeDocIndex(docs, "doc_id", "text",
          survivorsTable = bIdx.survivorsTable, pairsTable = bIdx.pairsTable)
        spark.table(bIdx.pairsTable)
      }),
      "s6_d12_from_index" -> (() =>
        PairIndex.curateFromIndex(spark, bIdx, "doc_id", "text")
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"))
          .orderBy(col("split"))),
      "s7_d18_from_index" -> (() =>
        PairIndex.clustersFromIndex(spark, bIdx).orderBy(col("doc_id"))),
      "s8_d21_from_index" -> (() =>
        PairIndex.clusterCurationFromIndex(spark, bIdx, "doc_id", "text")
          .orderBy(col("doc_id"))),
      "s11_d13_recompute" -> registered("d13_incremental_dedup"),
      "s12_materialize_corpus_index" -> (() => {
        val cidx = PairIndex.materializeCorpusIndex(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "text",
          hashesTable = "bpi_corpus_hashes",
          shinglesTable = "bpi_corpus_shingles")
        spark.table(cidx.shinglesTable)
      }),
      "s13_d13_from_index" -> (() =>
        PairIndex.dedupIncrementFromIndex(spark,
            PairIndex.CorpusIndex("bpi_corpus_hashes", "bpi_corpus_shingles"),
            docs.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text")
          .select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens"))
          .orderBy(col("doc_id"))),
      "s9_materialize_vec_index" -> (() => {
        graft.etl.Layout.writeBucketed(
          graft.operators.Similarity.nearDupLsh(
            graft.sources.Tables.embeddings(spark, sfDir), 20)
            .select(col("v1"), col("v2")),
          "bpi_vec_pairs", "v2", 32)
        spark.table("bpi_vec_pairs")
      }),
      "s10_e07_from_index" -> (() => {
        val cc = Components.connectedComponents(
          spark.table("bpi_vec_pairs"), "v1", "v2")
        cc.hint("merge")
          .join(cc.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size")), "lbl")
          .select(col("v").as("vec_id"), col("lbl").as("cluster_rep"),
            col("cluster_size"))
          .orderBy(col("vec_id"))
      }))

    // d12 residual-CPU attribution (round-11 VERDICT item 1): the
    // survivor set feeds TWO branches (shingle pipeline + anti-join
    // left side). If exchange reuse fails at decade scale — exactly
    // the Components round-10 failure class — the exact-dedup window
    // (md5 of every text + corpus sort) executes twice: extra CPU
    // that overlaps wall, matching the 4.6×-CPU/3.44×-wall signature.
    // s2 forces single execution via a persisted survivor set; if its
    // CPU tracks linear where s1 does not, the residual is attributed
    // and the fix is the persist. clearCache() between runs drops the
    // persisted blocks, so runs stay independent.
    val d12CkptStages: Seq[(String, () => DataFrame)] = Seq(
      "s1_curate_current" -> (() =>
        // explicit None: after the round-11 default flip this stage is
        // the recompute ARM of the A/B, not "current" — kept under its
        // logged name so the r11 logs stay comparable
        CorpusPipeline.curate(docs, persistSurvivors = None)
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"))),
      "s2_curate_persist_exact" -> (() =>
        CorpusPipeline.curate(docs,
            persistSurvivors = Some(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"))))

    // Advance economy (round-12, VERDICT item 2): what the daily run
    // actually compares — ADVANCING a standing 80% index with the 20%
    // batch (a2 − a1) vs REMATERIALIZING the full index (a3). Each
    // stage is self-contained (fresh per-invocation generations,
    // dropped before returning) so repeated runs neither compound an
    // index nor accumulate warehouse scratch; the timed closure does
    // the real writes itself and hands the harness a sentinel row.
    // The %5 split interleaves batch ids below corpus ids, so at real
    // SFs the advance takes the honest rewrite path (evictions +
    // cap-status changes) — telemetry records which path ran.
    // batch fraction knob: mod=5 → 20% batch (stress: at sf1+ the df-cap
    // crossing cascade marks ~the whole corpus affected and the advance
    // degrades to a rewrite); mod=64 → 1.6% batch (the realistic daily
    // increment, append path)
    val advMod = sys.env.getOrElse("SPARK_GRAFT_ADV_MOD", "5").toInt
    val advIdxStages: Seq[(String, () => DataFrame)] = {
      def corpus = docs.filter(pmod(col("doc_id"), lit(advMod)) =!= 0)
      def batch = docs.filter(pmod(col("doc_id"), lit(advMod)) === 0)
      def sentinel = spark.range(1).toDF("ok")
      Seq(
        "a1_materialize_corpus80" -> (() => {
          val i = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
            keepPostings = true)
          PairIndex.dropDocIndex(spark, i); sentinel
        }),
        "a2_materialize80_advance20" -> (() => {
          val i = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
            keepPostings = true)
          val r = PairIndex.advanceDocIndex(spark, i, batch, "doc_id", "text")
          PairIndex.dropSuperseded(spark, i, r.idx)
          PairIndex.dropDocIndex(spark, r.idx); sentinel
        }),
        // forced-delta exact advance (round-14, VERDICT item 8): the
        // guard disabled, so this rung measures the post-fix cost of
        // the AUDITED delta path itself (a2 above measures what the
        // guard actually does, which at stress batch fractions is the
        // fallback) — the same registration d31 pins for correctness
        "a2x_materialize80_advance20_forced" -> (() => {
          val i = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
            keepPostings = true)
          val r = PairIndex.advanceDocIndex(spark, i, batch, "doc_id", "text",
            economyGuard = Double.PositiveInfinity)
          PairIndex.dropSuperseded(spark, i, r.idx)
          PairIndex.dropDocIndex(spark, r.idx); sentinel
        }),
        // frozen-cap daily path (round-13): same advance, existing
        // pairs keep birth scores — telemetry distinguishes it
        "a2f_materialize80_frozen20" -> (() => {
          val i = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
            keepPostings = true)
          val r = PairIndex.advanceDocIndex(spark, i, batch, "doc_id", "text",
            frozenCaps = true)
          PairIndex.dropSuperseded(spark, i, r.idx)
          PairIndex.dropDocIndex(spark, r.idx); sentinel
        }),
        "a3_materialize_full" -> (() => {
          val i = PairIndex.materializeDocIndex(docs, "doc_id", "text",
            keepPostings = true)
          PairIndex.dropDocIndex(spark, i); sentinel
        }))
    }

    val ladder = sys.env.getOrElse("SPARK_GRAFT_STAGES", "d12")
    val allStages = ladder match {
      case "d18" => d18Stages
      case "q32" => q32Stages
      case "d12alt" => d12AltStages
      case "pairidx" => pairIdxStages
      case "advidx" => advIdxStages
      case "d12ckpt" => d12CkptStages
      case _ => d12Stages
    }
    // optional comma-separated stage-name subset, so expensive rungs
    // (sf30) can run just the arms a given A/B needs — order preserved
    // from the ladder definition (materialize stages stay ahead of
    // their consumers)
    val stages = sys.env.get("SPARK_GRAFT_STAGE_FILTER") match {
      case Some(f) =>
        val keep = f.split(",").map(_.trim).filter(_.nonEmpty).toSet
        allStages.filter { case (n, _) => keep(n) }
      case None => allStages
    }

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val out = stages.map { case (name, fn) =>
      Telemetry.drain()
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
      // telemetry (e.g. Components' per-phase wall-ms) accumulates over
      // the stage's runs — divide by `runs` when reading absolutes
      (name, med(times.map(_._1)), med(times.map(_._2)), Telemetry.drain())
    }
    def fmt(v: Double) = f"$v%.4f"
    val walls = out.map { case (k, w, _, _) => "\"" + k + "\":" + fmt(w) }
      .mkString("{", ",", "}")
    val cpu = out.map { case (k, _, c, _) => "\"" + k + "\":" + fmt(c) }
      .mkString("{", ",", "}")
    val tel = out.collect { case (k, _, _, t) if t.nonEmpty =>
      "\"" + k + "\":" + t.toSeq.sortBy(_._1)
        .map { case (m, v) => "\"" + m + "\":" + v }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"${ladder}_stages","sf":"$sfDir","runs":$runs,"telemetry":$tel,"cpu_sec":$cpu,"wall":$walls}""")
    spark.stop()
  }
}
