package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized candidate-pair index — the compute-once/join-many
  * protocol a 100 TB dedup run actually uses (round-11, VERDICT item
  * 2).
  *
  * In the per-query registry, d12/d13/d18/d21 (and e07 on the vector
  * side) each re-run candidate-pair generation from the raw corpus —
  * correct and self-contained, but pair generation is 96-98% of each
  * query's wall, so the suite pays the same dominant stage four times.
  * At corpus scale nobody does that: the shingle→Jaccard pair index is
  * computed ONCE per corpus snapshot, written bucketed, and every
  * downstream consumer (drop-list curation, cluster assignment,
  * cluster-best selection, incremental dedup) JOINS the artifact.
  *
  * Two artifacts, as a real pipeline maintains between runs:
  *  - `survivorsTable`: exact-dedup survivors, bucketed+sorted by the
  *    doc id. (Pair generation runs over survivors — clustering exact
  *    duplicates is pointless, and their identical shingle sets would
  *    only inflate per-shingle document frequencies toward the df-cap.)
  *  - `pairsTable`: `Dedup.jaccardPairs` over the survivors (the exact
  *    universe d07/d12 pin against DuckDB), bucketed+sorted by
  *    `doc_id2` — the key the hottest consumer (the curation drop list
  *    → anti join) probes with.
  *
  * Because both tables are bucketed with the SAME bucket count on
  * their join keys, the drop-list consumer plans with ZERO exchanges:
  * the bucketed scans already satisfy the distinct's and the anti
  * join's distribution requirements (asserted by PairIndexSpec). At
  * 1000 executors that is the difference between re-shuffling the
  * corpus per consumer and a per-bucket local merge.
  *
  * Consumers mirror the registered queries' semantics over the
  * survivor universe; `curateFromIndex` is hash-pinned against the
  * d12 DuckDB oracle end-to-end via the registered
  * `d28_pair_index_curation` query.
  */
object PairIndex {

  /** Catalog table names of one materialized index generation. */
  final case class DocIndex(survivorsTable: String, pairsTable: String)

  val SurvivorsBase = "graft_pair_survivors"
  val PairsBase = "graft_pair_index"
  val CorpusHashesBase = "graft_corpus_hashes"
  val CorpusShinglesBase = "graft_corpus_shingles"

  // per-JVM tag + per-call counter: two concurrent consumers in one
  // session get distinct generations from the counter; two sessions
  // sharing a warehouse get distinct generations from the pid
  private val jvmTag: String = s"p${ProcessHandle.current().pid()}"
  private val gen = new java.util.concurrent.atomic.AtomicLong(0)

  /** Fresh per-invocation catalog table name (round-12, VERDICT item
    * 1). The previous FIXED default names made any two concurrent
    * materialize+consume flows — d28 and d29 in one bench session, or
    * two corpus snapshots in a long-lived cluster session — race on
    * writeBucketed's drop/delete/rewrite while the other side was
    * mid-read. Every generation now gets its own tables; callers that
    * WANT a shared standing artifact pass explicit names. */
  def freshName(prefix: String): String =
    s"${prefix}_${jvmTag}_g${gen.incrementAndGet()}"

  /** Garbage-collect index generations left by PREVIOUS JVMs: drops
    * catalog tables and deletes orphaned warehouse directories whose
    * name starts with `prefix` but does not carry this JVM's tag.
    * Registered queries call this before materializing, so a shared
    * warehouse (./spark-warehouse across bench runs) holds at most one
    * JVM's worth of generations. Never touches this JVM's own live
    * generations — a concurrent flow in this session is safe. */
  def sweepStale(spark: SparkSession, prefix: String): Unit = {
    val lower = prefix.toLowerCase
    def stale(n: String) = n.startsWith(lower) && !n.contains(s"_${jvmTag}_")
    spark.catalog.listTables().collect().map(_.name).filter(stale)
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh))
      fs.listStatus(wh).foreach { st =>
        val n = st.getPath.getName
        if (stale(n) && !spark.catalog.tableExists(n)) fs.delete(st.getPath, true)
      }
  }

  /** Drop one generation's tables (call after the consuming action when
    * the index is no longer needed — e.g. specs and one-shot flows). */
  def dropDocIndex(spark: SparkSession, idx: DocIndex): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `${idx.survivorsTable}`")
    spark.sql(s"DROP TABLE IF EXISTS `${idx.pairsTable}`")
  }

  def dropCorpusIndex(spark: SparkSession, idx: CorpusIndex): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `${idx.hashesTable}`")
    spark.sql(s"DROP TABLE IF EXISTS `${idx.shinglesTable}`")
  }

  /** Compute survivors + pair index once and write both bucketed.
    * `numBuckets` sizes the co-location unit: at corpus scale it should
    * track executor count × a small factor (buckets are the parallelism
    * floor of every downstream no-shuffle join). Default table names
    * are per-invocation-unique (`freshName`); pass explicit names for a
    * standing artifact consumed across sessions. */
  def materializeDocIndex(docs: DataFrame, idCol: String, textCol: String,
                          threshold: Double = 0.6, maxDocFreq: Int = 100,
                          shingleK: Int = 3, numBuckets: Int = 32,
                          survivorsTable: String = freshName(SurvivorsBase),
                          pairsTable: String = freshName(PairsBase)): DocIndex = {
    val spark = docs.sparkSession
    graft.etl.Layout.writeBucketed(
      Dedup.dropExactDuplicates(docs, idCol, textCol),
      survivorsTable, idCol, numBuckets)
    // pair generation reads the WRITTEN survivors artifact (not the
    // lazy dedup plan): the exact-dedup window runs once at write time,
    // and the shingle pipeline scans bucketed parquet — on a cluster
    // that read is the cheap, re-runnable part
    val survivors = spark.table(survivorsTable)
    graft.etl.Layout.writeBucketed(
      Dedup.jaccardPairs(
        Dedup.shingles(survivors, idCol, textCol, shingleK),
        threshold, maxDocFreq),
      pairsTable, "doc_id2", numBuckets)
    DocIndex(survivorsTable, pairsTable)
  }

  /** Near-dup drop list from the index: distinct doc_id2. Rides the
    * pairs table's bucketing — no exchange for the distinct, none for
    * a subsequent join on the id (PairIndexSpec asserts both). */
  def droplist(spark: SparkSession, idx: DocIndex, idCol: String): DataFrame =
    spark.table(idx.pairsTable)
      .select(col("doc_id2").as(idCol))
      .distinct()

  /** d12's curation tail reading the index: survivors anti-join the
    * drop list (bucket-co-located, zero shuffles until the caller's
    * aggregation), then the same lang/quality/split gates as
    * `CorpusPipeline.curate`. Result is row-identical to running
    * `curate` on the raw docs — pinned by the d28 oracle entry. */
  def curateFromIndex(spark: SparkSession, idx: DocIndex,
                      idCol: String, textCol: String,
                      lang: String = "en", minQuality: Double = 0.3): DataFrame =
    spark.table(idx.survivorsTable)
      .join(droplist(spark, idx, idCol), Seq(idCol), "left_anti")
      .filter(TextAnalysis.langIdHeuristic(col(textCol)) === lang)
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .withColumn("split",
        TextAnalysis.hashSplit(TextAnalysis.textHash(col(textCol))))

  /** d18's cluster assignment reading the index (survivor universe):
    * connected components over the materialized pairs plus the size
    * join — pair generation is a parquet scan here, not a recompute.
    * `checkpointDir` selects Components' per-round snapshot durability
    * (round-12, VERDICT item 5): pass a shared-store path on a real
    * cluster so an executor loss mid-clustering resumes from the
    * reliable checkpoint instead of killing the job. */
  def clustersFromIndex(spark: SparkSession, idx: DocIndex,
                        checkpointDir: Option[String] = None): DataFrame = {
    val cc = Components.connectedComponents(
      spark.table(idx.pairsTable), "doc_id1", "doc_id2",
      checkpointDir = checkpointDir)
    cc.hint("merge")
      .join(cc.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size")), "lbl")
      .select(col("v").as("doc_id"), col("lbl").as("cluster_rep"),
        col("cluster_size"))
  }

  /** Standing-corpus artifacts for INCREMENTAL dedup — what
    * `Dedup.dedupIncrement`'s scaladoc promises a 100 TB pipeline
    * maintains between daily runs: the corpus canonical-hash set and
    * the corpus shingle index, so a new batch is deduplicated without
    * re-hashing or re-shingling the corpus. Shingles are stored as the
    * RAW strings `Dedup.shingles` emits (not pre-hashed), so the
    * from-index consumer feeds `crossJaccardPairs` the exact relation
    * the recompute path does — results are row-identical by
    * construction (pinned by the d30 oracle entry).
    *
    * Measured caveat (benchlogs_r11/pairidx_sf01_r2.log): unlike the
    * pair index — a 4.7x suite win at sf10 — the SHINGLE index is a
    * measured LOSS at sf0.1 (consumer 3.75 s vs 3.30 s recompute,
    * before materialize cost): the native codegen shingle kernel
    * (plans.ShinglesExpr) makes corpus re-shingling a cheap byte scan,
    * while the expanded raw-string index is ~10x the text in parquet
    * I/O. A hashed, pre-capped posting list would be far smaller, but
    * d13's df-cap is defined over the COMBINED batch+corpus universe,
    * so pre-capping the corpus side would change the semantics — the
    * raw index is what preserves exactness. Use this artifact when the
    * corpus text itself is expensive to re-read (remote store, wide
    * rows); with cheap local text scans, recompute and keep only the
    * hash-set artifact. */
  final case class CorpusIndex(hashesTable: String, shinglesTable: String)

  /** Materialize the standing corpus's hash set (bucketed by the hash —
    * the batch anti-join key) and shingle index (bucketed by the
    * shingle — the key every downstream aggregation and semi-join
    * clusters on). Run once per corpus snapshot; consumed by every
    * incoming batch until the corpus advances. Default table names are
    * per-invocation-unique (`freshName`). */
  def materializeCorpusIndex(corpus: DataFrame, idCol: String, textCol: String,
                             shingleK: Int = 3, numBuckets: Int = 32,
                             hashesTable: String = freshName(CorpusHashesBase),
                             shinglesTable: String = freshName(CorpusShinglesBase))
      : CorpusIndex = {
    graft.etl.Layout.writeBucketed(
      corpus.select(TextAnalysis.textHash(col(textCol)).as("__h")).distinct(),
      hashesTable, "__h", numBuckets)
    graft.etl.Layout.writeBucketed(
      Dedup.shingles(corpus, idCol, textCol, shingleK),
      shinglesTable, "s", numBuckets)
    CorpusIndex(hashesTable, shinglesTable)
  }

  /** `Dedup.dedupIncrement` reading the materialized corpus artifacts:
    * same three-stage contract (within-batch exact dedup → corpus-hash
    * anti join → cross-corpus df-capped Jaccard drop), with the corpus
    * side a bucketed parquet scan instead of a recompute. */
  def dedupIncrementFromIndex(spark: SparkSession, idx: CorpusIndex,
                              incoming: DataFrame,
                              idCol: String, textCol: String,
                              jaccardThreshold: Double = 0.6,
                              maxDocFreq: Int = 100,
                              shingleK: Int = 3): DataFrame = {
    val batch = Dedup.dropExactDuplicates(incoming, idCol, textCol)
    // merge, not broadcast, for the same cliff reasons as the recompute
    // path (Dedup.dedupIncrement scaladoc)
    val fresh = batch
      .withColumn("__h", TextAnalysis.textHash(col(textCol)))
      .join(spark.table(idx.hashesTable).hint("merge"), Seq("__h"), "left_anti")
      .drop("__h")
    val nearIds = Dedup.crossJaccardPairs(
        Dedup.shingles(fresh, idCol, textCol, shingleK),
        spark.table(idx.shinglesTable),
        jaccardThreshold, maxDocFreq)
      .select(col("inc_id").as(idCol))
      .distinct()
    fresh.join(nearIds.hint("merge"), Seq(idCol), "left_anti")
  }

  /** d21's keep-best-per-cluster reading the index: components over the
    * materialized pairs, LM-quality best pick (lowest mean neg-log-prob,
    * id tie-break), singletons unioned back — all over the survivor
    * universe the index governs. */
  def clusterCurationFromIndex(spark: SparkSession, idx: DocIndex,
                               idCol: String, textCol: String,
                               checkpointDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val survivors = spark.table(idx.survivorsTable)
    val cc = Components.connectedComponents(
      spark.table(idx.pairsTable), "doc_id1", "doc_id2",
      checkpointDir = checkpointDir)
    val scores = LmScore.score(survivors, idCol, textCol)
      .select(col(idCol), (col("sum_nlp_micro").cast("double")
        / col("n_tokens").cast("double")).as("__score"))
    val sized = cc.hint("merge")
      .join(cc.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size")), "lbl")
    val best = sized.join(scores, sized("v") === scores(idCol))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("lbl")).orderBy(col("__score"), col("v"))))
      .filter(col("__rk") === 1)
      .select(col("v").as(idCol), col("lbl").as("cluster_rep"),
        col("cluster_size"), lit("best_in_cluster").as("kept_reason"))
    val singletons = survivors.select(col(idCol))
      .join(cc, survivors(idCol) === cc("v"), "left_anti")
      .select(col(idCol), col(idCol).as("cluster_rep"),
        lit(1L).as("cluster_size"), lit("singleton").as("kept_reason"))
    best.unionByName(singletons)
  }
}
