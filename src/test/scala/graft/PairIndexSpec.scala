package graft

import graft.operators.{CorpusPipeline, Dedup, PairIndex}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shared pair index (round-11, VERDICT item 2): the materialized
  * compute-once/join-many protocol must (a) plan its hot consumer with
  * zero exchanges off the bucketed artifacts, and (b) reproduce the
  * recompute protocol's results row-for-row. */
class PairIndexSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val idx = PairIndex.materializeDocIndex(
    Tables.documents(spark, sfDir), "doc_id", "text",
    numBuckets = 4,
    survivorsTable = "pis_survivors", pairsTable = "pis_pairs")

  test("drop-list anti join plans with NO exchange off the bucketed tables") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val anti = spark.table(idx.survivorsTable)
        .join(PairIndex.droplist(spark, idx, "doc_id"), Seq("doc_id"), "left_anti")
      val plan = anti.queryExecution.executedPlan.toString
      // both the droplist's distinct and the anti join must ride the
      // bucketed scans' partitioning: any Exchange here means the
      // shared index failed at its one job (no corpus re-shuffle per
      // consumer)
      assert(!plan.contains("Exchange"), s"expected shuffle-free consumer:\n$plan")
      assert(anti.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("curateFromIndex == CorpusPipeline.curate on the same corpus") {
    val docs = Tables.documents(spark, sfDir)
    val fromIndex = PairIndex.curateFromIndex(spark, idx, "doc_id", "text")
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val recomputed = CorpusPipeline.curate(docs)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fromIndex === recomputed)
    assert(fromIndex.nonEmpty)
  }

  test("clustersFromIndex == components over recomputed survivor pairs") {
    val survivors = Dedup.dropExactDuplicates(
      Tables.documents(spark, sfDir), "doc_id", "text")
    val pairs = Dedup.jaccardPairs(
      Dedup.shingles(survivors, "doc_id", "text", 3), 0.6, 100)
    val cc = graft.operators.Components
      .connectedComponents(pairs, "doc_id1", "doc_id2")
    val expected = cc
      .join(cc.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size")), "lbl")
      .select(col("v"), col("lbl"), col("cluster_size")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = PairIndex.clustersFromIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("dedupIncrementFromIndex == Dedup.dedupIncrement on the same split") {
    import org.apache.spark.sql.functions.pmod
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val cidx = PairIndex.materializeCorpusIndex(corpus, "doc_id", "text",
      numBuckets = 4,
      hashesTable = "pis_corpus_hashes", shinglesTable = "pis_corpus_shingles")
    val fromIndex = PairIndex
      .dedupIncrementFromIndex(spark, cidx, incoming, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val recomputed = Dedup
      .dedupIncrement(corpus, incoming, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fromIndex === recomputed)
    assert(fromIndex.nonEmpty)
  }

  test("two concurrent default-named materialize+consume flows don't collide") {
    // round-12, VERDICT item 1: with the former FIXED default table
    // names, two concurrent flows raced on writeBucketed's
    // drop/delete/rewrite mid-read. Default names are now
    // per-invocation generations — run two full materialize+consume
    // flows simultaneously and require distinct tables and identical,
    // correct results from both.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val docs = Tables.documents(spark, sfDir)
    def flow(): (PairIndex.DocIndex, Set[(Long, String)]) = {
      val i = PairIndex.materializeDocIndex(docs, "doc_id", "text",
        numBuckets = 4)
      val rows = PairIndex.curateFromIndex(spark, i, "doc_id", "text")
        .select("doc_id", "split").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      (i, rows)
    }
    val (ra, rb) = Await.result(
      Future(flow()).zip(Future(flow())), 5.minutes)
    assert(ra._1.survivorsTable !== rb._1.survivorsTable)
    assert(ra._1.pairsTable !== rb._1.pairsTable)
    assert(ra._2 === rb._2)
    assert(ra._2.nonEmpty)
    // a consumer of flow A still reads cleanly AFTER flow B completed
    // (the old fixed names would have had B's rewrite drop A's tables)
    assert(spark.table(ra._1.survivorsTable).count() > 0)
    PairIndex.dropDocIndex(spark, ra._1)
    PairIndex.dropDocIndex(spark, rb._1)
  }

  test("sweepStale collects other-JVM generations but spares this JVM's") {
    val mine = PairIndex.materializeDocIndex(
      Tables.documents(spark, sfDir), "doc_id", "text", numBuckets = 4)
    // fake a DEAD JVM's leftover (pid far past the kernel pid ceiling)
    // and a LIVE foreign JVM's (pid 1 — the container init process):
    // the round-13 liveness gate must collect the first and spare the
    // second (ADVICE: a concurrent JVM sharing the warehouse must not
    // have its live index dropped mid-read)
    spark.range(3).toDF("x")
      .write.mode("overwrite").saveAsTable("graft_pair_survivors_p999999999_g1")
    spark.range(3).toDF("x")
      .write.mode("overwrite").saveAsTable("graft_pair_survivors_p1_g1")
    PairIndex.sweepStale(spark, PairIndex.SurvivorsBase)
    assert(!spark.catalog.tableExists("graft_pair_survivors_p999999999_g1"))
    assert(spark.catalog.tableExists("graft_pair_survivors_p1_g1"))
    spark.sql("DROP TABLE IF EXISTS graft_pair_survivors_p1_g1")
    assert(spark.catalog.tableExists(mine.survivorsTable))
    assert(spark.table(mine.survivorsTable).count() > 0)
    PairIndex.dropDocIndex(spark, mine)
  }

  // ---------- advanceDocIndex (round-12, VERDICT item 2) ----------

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def assertTablesEqual(a: PairIndex.DocIndex, b: PairIndex.DocIndex): Unit = {
    def eq(ta: String, tb: String): Unit = {
      val da = spark.table(ta)
      val db = spark.table(tb)
      assert(da.exceptAll(db).isEmpty && db.exceptAll(da).isEmpty,
        s"$ta vs $tb differ:\n${da.collect().mkString("\n")}\n--\n${db.collect().mkString("\n")}")
    }
    eq(a.survivorsTable, b.survivorsTable)
    eq(a.pairsTable, b.pairsTable)
    eq(a.postingsTable.get, b.postingsTable.get)
    // the df artifact stores append-only DELTA rows — semantic content
    // is the per-shingle sum, so equality is over the aggregate
    def dfAgg(t: String) = spark.table(t).groupBy(col("s"))
      .agg(sum(col("cnt")).as("df")).filter(col("df") > 0)
    val (da, db) = (dfAgg(a.dfTable.get), dfAgg(b.dfTable.get))
    assert(da.exceptAll(db).isEmpty && db.exceptAll(da).isEmpty,
      s"df artifacts ${a.dfTable.get} vs ${b.dfTable.get} differ")
  }

  test("advanceDocIndex append path is row-identical to from-scratch materialization") {
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g x",
      3L -> "totally unrelated content sits here quietly")
    val batch = docsDf(
      101L -> "a b c d e f g y", // cross near-dup of 1 and 2
      102L -> "m n o p q r s t",
      103L -> "m n o p q r s u") // within-batch near-dup of 102
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      economyGuard = Double.PositiveInfinity)
    assert(r.appended && r.newDocs === 3 && r.evicted === 0 && r.affectedOld === 0)
    assert(r.idx === idx) // in-place advance keeps the table names
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    assertTablesEqual(r.idx, scratch)
    // the advanced index must actually hold cross AND within-batch pairs
    val pairKeys = spark.table(r.idx.pairsTable)
      .select("doc_id1", "doc_id2").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairKeys.contains((102L, 103L)))
    assert(pairKeys.exists { case (x, y) => x <= 2 && y === 101L })
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("preserveInput advance never mutates the input index and stays row-identical") {
    // same fixture as the append-path test: without preserveInput this
    // is a pure in-place append (r.appended, r.idx eq idx); with it the
    // advance must write ALL-fresh generations, leave every input
    // table byte-identical, and still equal the from-scratch answer —
    // the copy-on-write contract the shared suite fixture relies on
    // (round-19, StandingFixtures)
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g x",
      3L -> "totally unrelated content sits here quietly")
    val batch = docsDf(
      101L -> "a b c d e f g y",
      102L -> "m n o p q r s t",
      103L -> "m n o p q r s u")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    val before = (Seq(idx.survivorsTable, idx.pairsTable)
      ++ idx.postingsTable ++ idx.dfTable)
      .map(t => t -> spark.table(t).collect().toSet).toMap
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      economyGuard = Double.PositiveInfinity, preserveInput = true)
    assert(!r.appended, "preserveInput must never report an in-place append")
    val inputTables = before.keySet
    val resultTables = (Seq(r.idx.survivorsTable, r.idx.pairsTable)
      ++ r.idx.postingsTable ++ r.idx.dfTable).toSet
    assert(resultTables.intersect(inputTables).isEmpty,
      s"preserveInput result reuses input tables: ${resultTables.intersect(inputTables)}")
    before.foreach { case (t, rows) =>
      assert(spark.table(t).collect().toSet === rows,
        s"preserveInput mutated input table $t")
    }
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    assertTablesEqual(r.idx, scratch)
    // frozen daily mode under copy-on-write: same guarantees
    val rf = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      frozenCaps = true, preserveInput = true)
    assert(!rf.appended)
    before.foreach { case (t, rows) =>
      assert(spark.table(t).collect().toSet === rows,
        s"frozen preserveInput mutated input table $t")
    }
    assertTablesEqual(rf.idx, scratch)
    PairIndex.dropDocIndex(spark, idx)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, rf.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("preserveInput pure-append advance is clone+append, not a copy-forward rewrite") {
    // round-20 (VERDICT-19 item 1): a preserved advance with no
    // evictions and no cap flips must take the APPEND write shape
    // against a storage-level clone — O(batch) Spark compute plus one
    // file copy — instead of redirecting to the full-rewrite branch's
    // O(index) copy-forward. The phase telemetry is the contract: the
    // clone phase plus the four append phases fire, and none of the
    // rewrite phases do.
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g x",
      3L -> "totally unrelated content sits here quietly")
    val batch = docsDf(
      101L -> "a b c d e f g y",
      102L -> "m n o p q r s t",
      103L -> "m n o p q r s u")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    graft.Telemetry.drain()
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      economyGuard = Double.PositiveInfinity, preserveInput = true)
    val tel = graft.Telemetry.drain()
    assert(tel.contains("pairindex.advance_ms_clone_index"))
    Seq("append_pairs", "append_postings", "append_survivors", "append_df")
      .foreach(p => assert(tel.contains(s"pairindex.advance_ms_$p"),
        s"preserved pure-append advance skipped phase $p"))
    tel.keys.filter(_.startsWith("pairindex.advance_ms_rewrite"))
      .foreach(p => fail(s"preserved pure-append advance ran rewrite phase $p"))
    assert(!r.appended && r.affectedOld === 0 && r.evicted === 0)
    PairIndex.dropDocIndex(spark, idx)
    PairIndex.dropDocIndex(spark, r.idx)
  }

  test("preserveInput covers the cap-flip partial rewrite: input intact, row-identical") {
    // the cap-flip fixture of the rescore test, under copy-on-write:
    // the partial-rewrite shape (cloned survivors/postings/df + fresh
    // pairs generation) must leave every input table byte-identical
    // and still equal the from-scratch answer
    val corpus = docsDf(
      1L -> "p q r s t u",
      2L -> "p q r s t v")
    val batch = docsDf(101L -> "p q r z1 z2 z3")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      threshold = 0.6, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    val before = (Seq(idx.survivorsTable, idx.pairsTable)
      ++ idx.postingsTable ++ idx.dfTable)
      .map(t => t -> spark.table(t).collect().toSet).toMap
    graft.Telemetry.drain()
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      economyGuard = Double.PositiveInfinity, preserveInput = true)
    val tel = graft.Telemetry.drain()
    assert(!r.appended && r.affectedOld === 2 && r.evicted === 0)
    // partial-rewrite shape: pairs rewritten fresh, the rest appended
    // to clones — never the full-rewrite branch's survivor/posting
    // copy-forward
    assert(tel.contains("pairindex.advance_ms_clone_index"))
    assert(tel.contains("pairindex.advance_ms_rewrite_pairs"))
    assert(!tel.contains("pairindex.advance_ms_rewrite_survivors"))
    assert(!tel.contains("pairindex.advance_ms_rewrite_postings"))
    val resultTables = (Seq(r.idx.survivorsTable, r.idx.pairsTable)
      ++ r.idx.postingsTable ++ r.idx.dfTable).toSet
    assert(resultTables.intersect(before.keySet).isEmpty,
      s"preserved cap-flip advance reuses input tables: " +
        s"${resultTables.intersect(before.keySet)}")
    before.foreach { case (t, rows) =>
      assert(spark.table(t).collect().toSet === rows,
        s"preserved cap-flip advance mutated input table $t")
    }
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      threshold = 0.6, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    assertTablesEqual(r.idx, scratch)
    PairIndex.dropDocIndex(spark, idx)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("preserveInput covers the eviction full rewrite: input intact, row-identical") {
    val corpus = docsDf(
      10L -> "alpha beta gamma delta epsilon zeta",
      11L -> "alpha beta gamma delta epsilon eta",
      12L -> "completely different text lives in this row")
    val batch = docsDf(5L -> "alpha beta gamma delta epsilon zeta") // == doc 10
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    val before = (Seq(idx.survivorsTable, idx.pairsTable)
      ++ idx.postingsTable ++ idx.dfTable)
      .map(t => t -> spark.table(t).collect().toSet).toMap
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      economyGuard = Double.PositiveInfinity, preserveInput = true)
    assert(!r.appended && r.evicted === 1 && r.newDocs === 1)
    before.foreach { case (t, rows) =>
      assert(spark.table(t).collect().toSet === rows,
        s"preserved eviction advance mutated input table $t")
    }
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    assertTablesEqual(r.idx, scratch)
    PairIndex.dropDocIndex(spark, idx)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("cloneDocIndex snapshots byte-identically and isolates in-place appends") {
    // the round-19 suite optimization: d32's in-place append runs
    // against a storage-level clone so the shared base fixture stays
    // pristine. The clone must (a) equal the source row-for-row on all
    // four tables, (b) carry the graft.* TBLPROPERTIES the advance
    // reads its semantics from, (c) keep the bucket layout (consumer
    // plans stay exchange-free), and (d) absorb an in-place append
    // WITHOUT the source observing any change.
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g x",
      3L -> "totally unrelated content sits here quietly")
    val batch = docsDf(
      101L -> "a b c d e f g y",
      102L -> "m n o p q r s t",
      103L -> "m n o p q r s u")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    val before = (Seq(idx.survivorsTable, idx.pairsTable)
      ++ idx.postingsTable ++ idx.dfTable)
      .map(t => t -> spark.table(t).collect().toSet).toMap
    val clone = PairIndex.cloneDocIndex(spark, idx)
    val cloneTabs = Seq(clone.survivorsTable, clone.pairsTable) ++
      clone.postingsTable ++ clone.dfTable
    assert(cloneTabs.toSet.intersect(before.keySet).isEmpty)
    // (a) row-identical snapshot
    (Seq(idx.survivorsTable -> clone.survivorsTable,
      idx.pairsTable -> clone.pairsTable) ++
      idx.postingsTable.zip(clone.postingsTable) ++
      idx.dfTable.zip(clone.dfTable)).foreach { case (src, dst) =>
      assert(spark.table(dst).collect().toSet === before(src),
        s"clone $dst differs from $src")
    }
    // (b) advance semantics readable off the clone's pairs table
    val props = spark.sql(s"SHOW TBLPROPERTIES `${clone.pairsTable}`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.threshold").contains("0.6"))
    assert(props.get("graft.numBuckets").contains("4"))
    // (c)+(d) the in-place append advances the CLONE and the source
    // stays byte-identical; the advanced clone equals a from-scratch
    // materialization of corpus ∪ batch
    val r = PairIndex.advanceDocIndex(spark, clone, batch, "doc_id", "text",
      economyGuard = Double.PositiveInfinity)
    assert(r.appended && (r.idx === clone))
    before.foreach { case (t, rows) =>
      assert(spark.table(t).collect().toSet === rows,
        s"append to clone mutated source table $t")
    }
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    assertTablesEqual(r.idx, scratch)
    PairIndex.dropDocIndex(spark, idx)
    PairIndex.dropDocIndex(spark, clone)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("advanceDocIndex rescores old pairs when the batch pushes a shingle over the df-cap") {
    // cap 2: corpus pair (1,2) scores 3/5 = 0.6 via shared shingles
    // {p q r, q r s, r s t}; the batch doc re-uses "p q r", pushing its
    // df to 3 > cap — the shingle leaves the capped universe, the old
    // pair drops to 2/4 = 0.5 < 0.6 and must DISAPPEAR from the
    // advanced index, which append-only maintenance could never do
    val corpus = docsDf(
      1L -> "p q r s t u",
      2L -> "p q r s t v")
    val batch = docsDf(101L -> "p q r z1 z2 z3")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      threshold = 0.6, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    assert(spark.table(idx.pairsTable).count() === 1) // (1,2) pre-advance
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      economyGuard = Double.PositiveInfinity)
    assert(!r.appended && r.affectedOld === 2 && r.evicted === 0)
    assert(r.idx.pairsTable !== idx.pairsTable) // fresh generation
    assert(spark.table(r.idx.pairsTable).count() === 0)
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      threshold = 0.6, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    assertTablesEqual(r.idx, scratch)
    // old generation stays intact for concurrent readers until dropped
    assert(spark.table(idx.pairsTable).count() === 1)
    PairIndex.dropDocIndex(spark, idx)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("advanceDocIndex handles a smaller-id batch duplicate evicting a corpus survivor") {
    val corpus = docsDf(
      10L -> "alpha beta gamma delta epsilon zeta",
      11L -> "alpha beta gamma delta epsilon eta",
      12L -> "completely different text lives in this row")
    val batch = docsDf(5L -> "alpha beta gamma delta epsilon zeta") // == doc 10
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      economyGuard = Double.PositiveInfinity)
    assert(!r.appended && r.evicted === 1 && r.newDocs === 1)
    val survivors = spark.table(r.idx.survivorsTable)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(5L, 11L, 12L))
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    assertTablesEqual(r.idx, scratch)
    PairIndex.dropDocIndex(spark, idx)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("two successive advances equal one-shot materialization (B2 pairs with B1)") {
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "totally unrelated content sits here quietly")
    val b1 = docsDf(101L -> "j k l m n o p q")
    val b2 = docsDf(201L -> "j k l m n o p r") // near-dup of B1's doc
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    val r1 = PairIndex.advanceDocIndex(spark, idx, b1, "doc_id", "text",
      economyGuard = Double.PositiveInfinity)
    val r2 = PairIndex.advanceDocIndex(spark, r1.idx, b2, "doc_id", "text",
      economyGuard = Double.PositiveInfinity)
    assert(r1.appended && r2.appended)
    val pairKeys = spark.table(r2.idx.pairsTable)
      .select("doc_id1", "doc_id2").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairKeys.contains((101L, 201L))) // advance 2 saw B1's postings
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(b1).unionByName(b2), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    assertTablesEqual(r2.idx, scratch)
    PairIndex.dropDocIndex(spark, r2.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("economy guard falls back to rematerialization and stays row-identical") {
    // default guard (0.3): a batch as large as the corpus can never
    // win on the delta path — the advance must take the internal
    // rematerialize and still produce the exact combined-corpus index
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "totally unrelated content sits here quietly")
    val batch = docsDf(
      101L -> "a b c d e f g y",
      102L -> "m n o p q r s t")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    Telemetry.drain()
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text")
    val tel = Telemetry.drain()
    assert(tel.get("pairindex.advance_fallback").contains(1L))
    assert(!r.appended && r.newDocs === 2)
    // fallback writes FRESH generations — nothing reused from the old
    assert(r.idx.survivorsTable !== idx.survivorsTable)
    assert(r.idx.pairsTable !== idx.pairsTable)
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    assertTablesEqual(r.idx, scratch)
    // the advanced index stays advanceable: semantics + nDocs stamped
    val props = spark.sql(s"SHOW TBLPROPERTIES `${r.idx.pairsTable}`")
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(props("graft.nDocs") === "4")
    PairIndex.dropDocIndex(spark, idx)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("frozen-cap advance == exact advance == from-scratch when no cap flips") {
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g x",
      3L -> "totally unrelated content sits here quietly")
    val batch = docsDf(
      101L -> "a b c d e f g y",
      102L -> "m n o p q r s t",
      103L -> "m n o p q r s u")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      frozenCaps = true)
    assert(r.appended && r.newDocs === 3 && r.affectedOld === 0)
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    assertTablesEqual(r.idx, scratch)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("frozen-cap advance keeps stale old-pair scores across a cap flip (documented drift)") {
    // same fixture as the exact-mode rescore spec: the batch pushes
    // "p q r" over cap 2, the exact advance DROPS the old pair (1,2);
    // frozen mode must keep it (birth score), while still adding
    // nothing spurious — and new-pair scoring still uses the CURRENT
    // capped universe
    val corpus = docsDf(
      1L -> "p q r s t u",
      2L -> "p q r s t v")
    val batch = docsDf(101L -> "p q r z1 z2 z3")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      threshold = 0.6, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      frozenCaps = true)
    assert(r.appended && r.affectedOld === 0)
    val pairs = spark.table(r.idx.pairsTable)
      .select("doc_id1", "doc_id2").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs === Set((1L, 2L))) // stale-but-kept; no new pair clears 0.6
    PairIndex.dropDocIndex(spark, r.idx)
  }

  test("frozen-cap advance handles evictions by pure row removal") {
    val corpus = docsDf(
      10L -> "alpha beta gamma delta epsilon zeta",
      11L -> "alpha beta gamma delta epsilon eta",
      12L -> "completely different text lives in this row")
    val batch = docsDf(5L -> "alpha beta gamma delta epsilon zeta") // == doc 10
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      frozenCaps = true)
    assert(!r.appended && r.evicted === 1 && r.newDocs === 1)
    // no cap flips in this fixture, so frozen == exact == from-scratch
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    assertTablesEqual(r.idx, scratch)
    PairIndex.dropDocIndex(spark, idx)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("two successive FROZEN advances equal one-shot materialization when flip-free") {
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "totally unrelated content sits here quietly")
    val b1 = docsDf(101L -> "j k l m n o p q")
    val b2 = docsDf(201L -> "j k l m n o p r") // near-dup of B1's doc
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    val r1 = PairIndex.advanceDocIndex(spark, idx, b1, "doc_id", "text",
      frozenCaps = true)
    val r2 = PairIndex.advanceDocIndex(spark, r1.idx, b2, "doc_id", "text",
      frozenCaps = true)
    assert(r1.appended && r2.appended)
    // advance 2 saw B1's appended postings AND df rows
    val pairKeys = spark.table(r2.idx.pairsTable)
      .select("doc_id1", "doc_id2").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairKeys.contains((101L, 201L)))
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(b1).unionByName(b2), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    assertTablesEqual(r2.idx, scratch)
    PairIndex.dropDocIndex(spark, r2.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("advance on a pre-df-artifact index (back-compat) falls back to the postings aggregation") {
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "totally unrelated content sits here quietly")
    val batch = docsDf(101L -> "a b c d e f g y")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    // simulate an index materialized before the df artifact existed
    idx.dfTable.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    val legacy = idx.copy(dfTable = None)
    val r = PairIndex.advanceDocIndex(spark, legacy, batch, "doc_id", "text",
      economyGuard = Double.PositiveInfinity)
    assert(r.appended && r.idx.dfTable.isEmpty) // stays df-less
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    // pairs/survivors/postings row-identical; no df table to compare
    def eq(ta: String, tb: String): Unit = {
      val (da, db) = (spark.table(ta), spark.table(tb))
      assert(da.exceptAll(db).isEmpty && db.exceptAll(da).isEmpty, s"$ta vs $tb")
    }
    eq(r.idx.survivorsTable, scratch.survivorsTable)
    eq(r.idx.pairsTable, scratch.pairsTable)
    eq(r.idx.postingsTable.get, scratch.postingsTable.get)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("autoBuckets floors small inputs at 32 and scales big ones to the 4096 cap") {
    // tiny real table → the pinned small-scale floor
    assert(PairIndex.autoBuckets(Tables.documents(spark, sfDir)) === 32)
    // range() carries an exact 8-bytes/row size estimate with no data
    // materialized: 2^37 rows ≈ 1 TiB → target count far past the cap
    assert(PairIndex.autoBuckets(spark.range(1L << 37).toDF("x")) === 4096)
    // mid-scale: ~32 GiB at the 128 MiB target → 256 buckets
    assert(PairIndex.autoBuckets(spark.range(1L << 32).toDF("x")) === 256)
  }

  test("keepLatest retains one grace generation, drops at the second supersede") {
    // round-14 ADVICE: keepLatest runs at query-CONSTRUCTION time, so
    // dropping the immediately-previous generation raced a re-entrant
    // invocation still reading it — the ring keeps gen_{k-1} live and
    // drops gen_{k-2}, making a single in-flight overlap safe
    val docs = Tables.documents(spark, sfDir)
    val g1 = PairIndex.materializeDocIndex(docs, "doc_id", "text", numBuckets = 4)
    PairIndex.keepLatest(spark, "spec-key", g1)
    assert(spark.catalog.tableExists(g1.survivorsTable))
    val g2 = PairIndex.materializeDocIndex(docs, "doc_id", "text", numBuckets = 4)
    PairIndex.keepLatest(spark, "spec-key", g2)
    // generation 1 is the GRACE generation — still live for a
    // concurrent reader that registered g2 while g1 was being consumed
    assert(spark.catalog.tableExists(g1.survivorsTable))
    assert(spark.catalog.tableExists(g2.survivorsTable))
    val g3 = PairIndex.materializeDocIndex(docs, "doc_id", "text", numBuckets = 4)
    PairIndex.keepLatest(spark, "spec-key", g3)
    // second supersede: generation 1 dropped, 2 (grace) and 3 live
    assert(!spark.catalog.tableExists(g1.survivorsTable))
    assert(!spark.catalog.tableExists(g1.pairsTable))
    assert(spark.catalog.tableExists(g2.survivorsTable))
    assert(spark.catalog.tableExists(g3.survivorsTable))
    // flush ends the session at <=1 live generation per key
    PairIndex.flushKeepLatest(spark)
    assert(!spark.catalog.tableExists(g2.survivorsTable))
    assert(spark.catalog.tableExists(g3.survivorsTable))
    assert(spark.table(g3.pairsTable).count() >= 0)
    PairIndex.keepLatest(spark, "spec-key", Seq.empty)
    PairIndex.keepLatest(spark, "spec-key", Seq.empty)
    assert(!spark.catalog.tableExists(g3.survivorsTable))
  }

  test("keepLatest never drops a table a retained generation reuses") {
    val docs = Tables.documents(spark, sfDir)
    val g1 = PairIndex.materializeDocIndex(docs, "doc_id", "text", numBuckets = 4)
    PairIndex.keepLatest(spark, "reuse-key", g1)
    // a partial-rewrite advance REUSES the survivors table: register a
    // "generation 2" sharing g1's survivors, then a fresh generation 3
    // — the shared survivors table must survive g1's eviction
    val g2 = g1.copy(pairsTable = PairIndex.freshName(PairIndex.PairsBase))
    spark.table(g1.pairsTable).write.saveAsTable(g2.pairsTable)
    PairIndex.keepLatest(spark, "reuse-key", g2)
    val g3 = PairIndex.materializeDocIndex(docs, "doc_id", "text", numBuckets = 4)
    PairIndex.keepLatest(spark, "reuse-key", g3)
    assert(spark.catalog.tableExists(g2.survivorsTable)) // shared with g1
    assert(!spark.catalog.tableExists(g1.pairsTable))    // g1-only: dropped
    PairIndex.flushKeepLatest(spark)
    PairIndex.keepLatest(spark, "reuse-key", Seq.empty)
    PairIndex.keepLatest(spark, "reuse-key", Seq.empty)
  }

  test("sweepStale treats an unparseable pid tag as stale instead of crashing") {
    // ADVICE round-14: a >19-digit pid-like tag overflowed Long and the
    // NumberFormatException killed every registered query that swept
    val weird = "graft_pair_survivors_p99999999999999999999_g1"
    spark.range(3).toDF("x").write.mode("overwrite").saveAsTable(weird)
    PairIndex.sweepStale(spark, PairIndex.SurvivorsBase) // must not throw
    assert(!spark.catalog.tableExists(weird))
  }

  test("autoBuckets falls back to the floor on unknown-stats inputs") {
    // a LogicalRDD (createDataFrame over an RDD) reports Catalyst's
    // defaultSizeInBytes sentinel, not a real estimate — trusting it
    // clamped tiny data to 4096 buckets (ADVICE round-14)
    import org.apache.spark.sql.types._
    val rdd = spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L)))
    val df = spark.createDataFrame(rdd, StructType(Seq(StructField("x", LongType))))
    assert(df.queryExecution.optimizedPlan.stats.sizeInBytes >=
      BigInt(org.apache.spark.sql.internal.SQLConf.get.defaultSizeInBytes))
    assert(PairIndex.autoBuckets(df) === 32)
  }

  test("autoBuckets per-bucket target is conf-tunable") {
    val docs = Tables.documents(spark, sfDir)
    val dflt = PairIndex.autoBuckets(docs)
    assert(dflt === 32) // tiny table at the 128 MB default target
    spark.conf.set("spark.graft.autoBuckets.targetBytes", "64")
    try {
      val tuned = PairIndex.autoBuckets(docs)
      assert(tuned > 32, s"expected a 64-byte target to beat the floor, got $tuned")
    } finally spark.conf.unset("spark.graft.autoBuckets.targetBytes")
  }

  test("guard fallback re-derives the bucket count from the combined survivors") {
    // round-14, VERDICT item 3: the fallback replaces ALL four tables,
    // so an index born small must escape its birth bucket count there.
    // A tiny conf target makes the combined survivors exceed the floor.
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "totally unrelated content sits here quietly")
    val batch = docsDf(
      101L -> "a b c d e f g y",
      102L -> "m n o p q r s t")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    spark.conf.set("spark.graft.autoBuckets.targetBytes", "8")
    val r =
      try PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
        economyGuard = 0.0) // force the fallback
      finally spark.conf.unset("spark.graft.autoBuckets.targetBytes")
    assert(!r.appended)
    val props = spark.sql(s"SHOW TBLPROPERTIES `${r.idx.pairsTable}`")
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    val stamped = props("graft.numBuckets").toInt
    assert(stamped > 4, s"fallback kept the birth bucket count: $stamped")
    // the physical table really carries the re-derived bucket spec, and
    // all four artifacts share it (the co-location contract)
    def bucketsOf(t: String): String = spark.sql(s"DESCRIBE EXTENDED `$t`")
      .collect().find(_.getString(0) == "Num Buckets").map(_.getString(1)).getOrElse("?")
    assert(bucketsOf(r.idx.pairsTable) === stamped.toString)
    assert(bucketsOf(r.idx.survivorsTable) === stamped.toString)
    assert(bucketsOf(r.idx.postingsTable.get) === stamped.toString)
    assert(bucketsOf(r.idx.dfTable.get) === stamped.toString)
    // results stay row-identical to a from-scratch materialization
    val scratch = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      numBuckets = 4, keepPostings = true)
    assertTablesEqual(r.idx, scratch)
    // and the grown index stays consumable with zero exchanges
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val anti = spark.table(r.idx.survivorsTable)
        .join(PairIndex.droplist(spark, r.idx, "doc_id"), Seq("doc_id"), "left_anti")
      val plan = anti.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free consumer:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    PairIndex.dropDocIndex(spark, idx)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("assertNoCapFlips turns a flip under frozen caps into an attributable failure") {
    // the d32 gate's precondition (ADVICE round-14): a frozen advance
    // pinned to the exact oracle must fail LOUDLY when the batch flips
    // a cap status, instead of an anonymous hash mismatch downstream
    val corpus = docsDf(
      1L -> "p q r s t u",
      2L -> "p q r s t v")
    val batch = docsDf(101L -> "p q r z1 z2 z3") // pushes "p q r" over cap 2
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      threshold = 0.6, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    val e = intercept[IllegalStateException] {
      PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
        frozenCaps = true, assertNoCapFlips = true)
    }
    assert(e.getMessage.contains("cap-status flip"))
    // flip-free batch passes with the assertion on
    val ok = PairIndex.advanceDocIndex(spark, idx,
      docsDf(102L -> "w1 w2 w3 w4 w5 w6"), "doc_id", "text",
      frozenCaps = true, assertNoCapFlips = true)
    assert(ok.appended)
    PairIndex.dropDocIndex(spark, ok.idx)
  }

  test("pairDrift pins the frozen-vs-exact drift metrics on a known cap flip") {
    // threshold 0.5, cap 2: corpus pair (1,2) is born at jaccard 3/5 =
    // 0.6; the batch flips "p q r" over the cap, so the EXACT universe
    // rescores the pair to 2/4 = 0.5 (still qualifying). The frozen
    // index keeps the 0.6 birth score → exactly one score-drifted
    // common pair, delta 0.1, nothing missing or spurious.
    val corpus = docsDf(
      1L -> "p q r s t u",
      2L -> "p q r s t v")
    val batch = docsDf(101L -> "p q r z1 z2 z3")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      threshold = 0.5, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      frozenCaps = true)
    val exact = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      threshold = 0.5, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    val d = PairIndex.pairDrift(spark, r.idx, exact)
    assert(d.nPairsExact === 1 && d.nPairsFrozen === 1 && d.nPairsCommon === 1)
    assert(d.nScoreDrifted === 1 && d.nPairsMissing === 0 && d.nPairsSpurious === 0)
    assert(math.abs(d.maxAbsJaccardDelta - 0.1) < 1e-9)
    // magnitude stats over ALL common pairs: one pair, delta 0.1
    assert(math.abs(d.meanAbsJaccardDelta - 0.1) < 1e-9)
    assert(math.abs(d.p99AbsJaccardDelta - 0.1) < 1e-9)
    assert(math.abs(d.fracPairsDrifted - 1.0) < 1e-9)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, exact)
  }

  test("pairDrift counts a spurious frozen pair the exact universe dropped") {
    // threshold 0.6 version of the same flip: exact mode DROPS (1,2)
    // (2/4 = 0.5 < 0.6) while frozen keeps the 0.6 birth score — one
    // spurious pair, zero common, frac 1.0 against an empty exact set
    val corpus = docsDf(
      1L -> "p q r s t u",
      2L -> "p q r s t v")
    val batch = docsDf(101L -> "p q r z1 z2 z3")
    val idx = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      threshold = 0.6, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    val r = PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text",
      frozenCaps = true)
    val exact = PairIndex.materializeDocIndex(
      corpus.unionByName(batch), "doc_id", "text",
      threshold = 0.6, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    val d = PairIndex.pairDrift(spark, r.idx, exact)
    assert(d.nPairsExact === 0 && d.nPairsFrozen === 1 && d.nPairsCommon === 0)
    assert(d.nScoreDrifted === 0 && d.nPairsMissing === 0 && d.nPairsSpurious === 1)
    assert(d.meanAbsJaccardDelta === 0.0 && d.p99AbsJaccardDelta === 0.0)
    assert(math.abs(d.fracPairsDrifted - 1.0) < 1e-9)
    // the spurious pair moves the END answer: doc 2 is dropped by the
    // frozen curation but kept by the exact one (lang/quality gates
    // open so the synthetic corpus passes)
    val lang = graft.operators.TextAnalysis.langIdHeuristic(col("text"))
    val l = spark.createDataFrame(Seq(Tuple1("p q r s t u"))).toDF("text")
      .select(lang).head().getString(0)
    val (ne, nf, diff) = PairIndex.curationDrift(spark, r.idx, exact,
      "doc_id", "text", lang = l, minQuality = 0.0)
    assert(ne === nf + 1 && diff === 1)
    PairIndex.dropDocIndex(spark, r.idx)
    PairIndex.dropDocIndex(spark, exact)
  }

  test("frozen advances accumulate drift counters; exact carries; rematerialize resets") {
    // flip fixture (same as the rescore spec): cap 2, the batch pushes
    // "p q r" to df 3 > cap — one real cap flip under frozen mode
    val corpus = docsDf(
      1L -> "p q r s t u",
      2L -> "p q r s t v")
    val idx0 = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      threshold = 0.6, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    val e0 = PairIndex.driftEstimate(spark, idx0)
    assert(e0.frozenAdvances === 0 && e0.capFlips === 0 &&
      e0.estMeanScoreDrift === 0.0 && !e0.rebuildDue(1e-9))
    val r1 = PairIndex.advanceDocIndex(spark, idx0,
      docsDf(101L -> "p q r z1 z2 z3"), "doc_id", "text", frozenCaps = true)
    assert(r1.capFlips === 1 && r1.flipHolders === 2) // "p q r": df 2 -> 3
    val e1 = PairIndex.driftEstimate(spark, r1.idx)
    assert(e1.frozenAdvances === 1 && e1.capFlips === 1 && e1.flipHolders === 2)
    assert(e1.estMeanScoreDrift > 0.0 && e1.estSpuriousFrac > 0.0)
    assert(e1.rebuildDue(e1.estMeanScoreDrift / 2) &&
      !e1.rebuildDue(e1.estMeanScoreDrift * 2))
    assert(e1.untrackedAdvances === 0)
    // EXACT advance (flip-free batch): accumulated frozen drift CARRIES
    // (untouched pairs keep their possibly-drifted scores)
    val r2 = PairIndex.advanceDocIndex(spark, r1.idx,
      docsDf(201L -> "w1 w2 w3 w4 w5 w6"), "doc_id", "text",
      economyGuard = Double.PositiveInfinity)
    val e2 = PairIndex.driftEstimate(spark, r2.idx)
    assert(e2.frozenAdvances === 1 && e2.capFlips === 1 &&
      e2.estMeanScoreDrift === e1.estMeanScoreDrift)
    // economy-guard fallback = full rematerialization: drift RESETS
    val r3 = PairIndex.advanceDocIndex(spark, r2.idx,
      docsDf(301L -> "y1 y2 y3 y4 y5 y6"), "doc_id", "text",
      economyGuard = 0.0)
    val e3 = PairIndex.driftEstimate(spark, r3.idx)
    assert(e3.frozenAdvances === 0 && e3.capFlips === 0 &&
      e3.estMeanScoreDrift === 0.0)
    PairIndex.dropSuperseded(spark, idx0, r1.idx)
    PairIndex.dropSuperseded(spark, r1.idx, r2.idx)
    PairIndex.dropSuperseded(spark, r2.idx, r3.idx)
    PairIndex.dropDocIndex(spark, r3.idx)
  }

  test("driftStats=false records an untracked frozen advance") {
    val corpus = docsDf(
      1L -> "p q r s t u",
      2L -> "p q r s t v")
    val idx0 = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      threshold = 0.6, maxDocFreq = 2, numBuckets = 4, keepPostings = true)
    val r = PairIndex.advanceDocIndex(spark, idx0,
      docsDf(101L -> "p q r z1 z2 z3"), "doc_id", "text",
      frozenCaps = true, driftStats = false)
    assert(r.capFlips === 0) // not measured, by request
    val e = PairIndex.driftEstimate(spark, r.idx)
    // the estimator can't see the skipped advance's drift — but it KNOWS
    // it's blind: untracked counts the estimate-invisible advances
    assert(e.frozenAdvances === 1 && e.untrackedAdvances === 1 &&
      e.estMeanScoreDrift === 0.0)
    PairIndex.dropSuperseded(spark, idx0, r.idx)
    PairIndex.dropDocIndex(spark, r.idx)
  }

  test("merge-probe fallback (batch above broadcast budget) stays row-identical") {
    val prev = spark.conf.getOption("spark.graft.advance.broadcastProbeMaxBatch")
    try {
      spark.conf.set("spark.graft.advance.broadcastProbeMaxBatch", "0")
      val corpus = docsDf(
        10L -> "alpha beta gamma delta epsilon zeta",
        11L -> "alpha beta gamma delta epsilon eta",
        12L -> "completely different text lives in this row")
      val batch = docsDf(
        5L -> "alpha beta gamma delta epsilon zeta", // evicts doc 10
        103L -> "m n o p q r s u")
      val idx0 = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
        numBuckets = 4, keepPostings = true)
      val r = PairIndex.advanceDocIndex(spark, idx0, batch, "doc_id", "text",
        economyGuard = Double.PositiveInfinity)
      assert(r.evicted === 1)
      val scratch = PairIndex.materializeDocIndex(
        corpus.unionByName(batch), "doc_id", "text",
        numBuckets = 4, keepPostings = true)
      assertTablesEqual(r.idx, scratch)
      PairIndex.dropDocIndex(spark, idx0)
      PairIndex.dropDocIndex(spark, r.idx)
      PairIndex.dropDocIndex(spark, scratch)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.advance.broadcastProbeMaxBatch", v)
        case None => spark.conf.unset("spark.graft.advance.broadcastProbeMaxBatch")
      }
    }
  }

  test("compactDocIndex restores one file per bucket with rows, props and plans intact") {
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g x",
      3L -> "totally unrelated content sits here quietly")
    // 2 buckets so every bucket is non-empty (a bucket with no rows
    // writes no file, which would make an exact ==1.0 check flaky)
    val idx0 = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 2, keepPostings = true)
    // two append-path frozen advances -> >=3 file sets over 2 buckets
    val r1 = PairIndex.advanceDocIndex(spark, idx0,
      docsDf(101L -> "m n o p q r s t"), "doc_id", "text", frozenCaps = true)
    val r2 = PairIndex.advanceDocIndex(spark, r1.idx,
      docsDf(201L -> "m n o p q r s u"), "doc_id", "text", frozenCaps = true)
    val beforeSurv = PairIndex.filesPerBucket(spark, r2.idx.survivorsTable)
    assert(beforeSurv > 1.0)
    val props0 = spark.sql(s"SHOW TBLPROPERTIES `${r2.idx.pairsTable}`")
      .collect().map(r => r.getString(0) -> r.getString(1))
      .filter(_._1.startsWith("graft.")).toMap
    val compacted = PairIndex.compactDocIndex(spark, r2.idx, "doc_id")
    for (t <- Seq(compacted.survivorsTable, compacted.pairsTable,
        compacted.postingsTable.get, compacted.dfTable.get))
      assert(PairIndex.filesPerBucket(spark, t) <= 1.0,
        s"$t not compacted to <=1 file/bucket")
    assert(PairIndex.filesPerBucket(spark, compacted.survivorsTable) < beforeSurv)
    assertTablesEqual(compacted, r2.idx)
    // semantics AND drift accumulators carry verbatim
    val props1 = spark.sql(s"SHOW TBLPROPERTIES `${compacted.pairsTable}`")
      .collect().map(r => r.getString(0) -> r.getString(1))
      .filter(_._1.startsWith("graft.")).toMap
    assert(props1 === props0)
    // the hot consumer still plans with zero exchanges off the
    // compacted artifacts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val anti = spark.table(compacted.survivorsTable)
        .join(PairIndex.droplist(spark, compacted, "doc_id"), Seq("doc_id"), "left_anti")
      val plan = anti.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free consumer:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    PairIndex.dropDocIndex(spark, idx0)
    PairIndex.dropSuperseded(spark, r2.idx, compacted)
    PairIndex.dropDocIndex(spark, compacted)
  }

  test("auto-compaction keeps a 10-frozen-advance chain within the files/bucket bound") {
    // round-16, VERDICT item 3: advances consult compactDue themselves —
    // a long frozen chain must keep its consumers at bounded read
    // amplification with NO manual compactDocIndex call, and the chain
    // must stay row-identical to from-scratch materialization.
    val corpus = docsDf(
      1L -> "a b c d e f g h",
      2L -> "totally unrelated content sits here quietly")
    val idx0 = PairIndex.materializeDocIndex(corpus, "doc_id", "text",
      numBuckets = 2, keepPostings = true)
    val bound = 3.0
    var cur = idx0
    var all = corpus
    var compactions = 0
    for (i <- 1 to 10) {
      // distinct tokens per batch → flip-free, so every advance takes
      // the pure-append path unless the auto-compaction fires
      val b = docsDf((100L + i) ->
        s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h")
      all = all.unionByName(b)
      val prev = cur
      val r = PairIndex.advanceDocIndex(spark, prev, b, "doc_id", "text",
        frozenCaps = true, autoCompactMaxFiles = bound)
      if (!r.appended) compactions += 1
      for (t <- Seq(r.idx.survivorsTable, r.idx.pairsTable) ++
          r.idx.postingsTable ++ r.idx.dfTable)
        assert(PairIndex.filesPerBucket(spark, t) <= bound,
          s"advance $i left $t over the $bound files/bucket bound")
      assert(!PairIndex.compactDue(spark, r.idx, bound))
      PairIndex.dropSuperseded(spark, prev, r.idx)
      cur = r.idx
    }
    // 10 appends against a 3-files/bucket bound must have compacted
    // more than once — otherwise the bound assert above proved nothing
    assert(compactions >= 2, s"expected >=2 auto-compactions, saw $compactions")
    val scratch = PairIndex.materializeDocIndex(all, "doc_id", "text",
      numBuckets = 2, keepPostings = true)
    assertTablesEqual(cur, scratch)
    PairIndex.dropDocIndex(spark, idx0)
    PairIndex.dropDocIndex(spark, cur)
    PairIndex.dropDocIndex(spark, scratch)
  }

  test("clusterCurationFromIndex keeps exactly one doc per cluster plus singletons") {
    val out = PairIndex.clusterCurationFromIndex(spark, idx, "doc_id", "text")
    val rows = out.collect()
    val survivorCount = spark.table(idx.survivorsTable).count()
    val clustered = PairIndex.clustersFromIndex(spark, idx)
    val nClusters = clustered.select("cluster_rep").distinct().count()
    val nClusteredDocs = clustered.count()
    // one kept doc per cluster + every un-clustered survivor
    assert(rows.length === (survivorCount - nClusteredDocs + nClusters))
    assert(rows.count(_.getString(3) == "best_in_cluster") === nClusters)
    // kept set is one-per-cluster_rep
    val reps = rows.map(_.getLong(1))
    assert(reps.distinct.length === reps.length)
  }
}
