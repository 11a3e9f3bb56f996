package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, each designed
  * for the 100 TB regime:
  *
  *  - exact: hash-groupBy on a canonical form — one shuffle on the hash.
  *  - MinHash + LSH: shingle → k minhashes → band buckets → bucket join.
  *    The candidate join is on band keys, so cost is proportional to
  *    actual collisions, never all-pairs.
  *  - SimHash: 64-bit weighted bit-vote fingerprint; near-dup = small
  *    hamming distance, candidates blocked on 8-bit byte bands.
  *  - n-gram Jaccard: inverted-index join on shingles (pairs that share
  *    at least one shingle), again never all-pairs.
  *
  * Hashing is md5-based (not Spark's murmur `hash()`) so every stage is
  * engine-independent and oracle-checkable; md5 is also stable across
  * Spark versions, which matters for incremental dedup state at scale.
  */
object Dedup {

  // ---------------- exact ----------------

  private def duplicateGroups(df: DataFrame, idCol: String,
                              key: Column, keyName: String): DataFrame =
    df.select(key.as(keyName), col(idCol))
      .groupBy(col(keyName))
      .agg(count(lit(1)).as("n_docs"),
           min(col(idCol)).as("min_doc_id"),
           max(col(idCol)).as("max_doc_id"))
      .filter(col("n_docs") > 1)

  /** Exact duplicate groups: canonical-form hash → groups with >1 doc. */
  def exactDuplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    duplicateGroups(df, idCol, TextAnalysis.textHash(col(textCol)), "text_hash")

  /** Deterministic exact dedup: keep the smallest id per canonical hash.
    * (dropDuplicates keeps an arbitrary row; a window makes the survivor
    * reproducible — SURVEY.md §7.4 determinism policy.) */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.textHash(col(textCol)))
      .orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Bag-of-words fingerprint duplicate groups (order/repetition
    * invariant — catches shuffled near-dups). */
  def fingerprintDuplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    duplicateGroups(df, idCol, TextAnalysis.bagFingerprint(col(textCol)), "fp")

  // ---------------- shingles ----------------

  /** Distinct k-token shingles per document: (doc_id, s) — one narrow
    * pass over the corpus via the native generator. Per-document dedup
    * happens inside the row (array_distinct BEFORE explode), so no
    * global distinct() shuffle: the output is shuffle-free however
    * large the corpus. */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    // native codegen shingle array (plans.ShinglesExpr): the hottest
    // path of the dedup family — one byte copy per row, zero-copy
    // shingle windows, no interpreted per-shingle lambda
    df.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextAnalysis.shinglesCol(col(textCol), k))).as("s"))
  }

  // ---------------- MinHash + LSH ----------------

  /** k-permutation MinHash signature: four 32-bit hash functions are
    * carved out of each seeded md5 as disjoint 8-hex windows, so k
    * hashes cost k/4 md5 evaluations per shingle (the md5 is by far the
    * dominant cost at corpus scale). Each column m_i is the
    * lexicographic min of its window — equivalent to numeric min on the
    * 32-bit value. The seeded digests are pre-projected so aggregate
    * expressions never re-evaluate the md5 (no cross-aggregate CSE in
    * Spark). */
  def minhashSignature(shingleDf: DataFrame, numHashes: Int = 8): DataFrame = {
    require(numHashes % 4 == 0, "numHashes must be a multiple of 4")
    val nDigests = numHashes / 4
    val digests = shingleDf.select(
      col("doc_id") +:
        (0 until nDigests).map(j =>
          md5(concat(col("s"), lit(s"#$j"))).as(s"b$j")): _*)
    val aggs = (0 until numHashes).map { i =>
      min(substring(col(s"b${i / 4}"), 1 + 8 * (i % 4), 8)).as(s"m$i")
    }
    digests.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: split the signature into bands, key each band by the
    * md5 of its rows, self-join on (band, key). Only colliding buckets
    * pay join cost — the scale path for fuzzy dedup. */
  def lshCandidatePairs(sig: DataFrame, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val bandStructs = (0 until bands).map { b =>
      val key = md5(concat_ws("", (0 until rows).map(r => col(s"m${b * rows + r}")): _*))
      struct(lit(b).as("band"), key.as("bk"))
    }
    // repartition on the bucket key: the self-join's sides share one
    // Exchange (ReusedExchange), so the shingle→minhash chain upstream
    // is computed once, and the join adds no further shuffle.
    val bandsDf = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bk").as("bk"))
      .repartition(col("band"), col("bk"))
    bandsDf.as("a")
      .join(bandsDf.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"))
      .distinct()
  }

  // ---------------- n-gram Jaccard ----------------

  /** Pairwise Jaccard over shingle sets, restricted to pairs sharing at
    * least one shingle (inverted-index join — never all-pairs). Returns
    * exact intersection/union counts plus a rounded similarity.
    *
    * `maxDocFreq` caps hot-shingle fan-out: a shingle appearing in d
    * documents emits O(d²) candidate pairs, so one corpus-common
    * shingle is a single-key shuffle explosion at 100 TB. Shingles
    * above the cap are dropped from the universe — from BOTH the
    * intersections and the cardinalities, so the result is the exact
    * Jaccard over the capped shingle universe (consistent set
    * semantics, mirrored verbatim in the d07 oracle). The trade: a
    * pair whose every shared shingle is corpus-hot scores lower —
    * acceptable for near-dup mining, where corpus-hot shingles carry
    * no dedup signal anyway. */
  def jaccardPairs(shingleDf: DataFrame, threshold: Double,
                   maxDocFreq: Int = Int.MaxValue): DataFrame = {
    // The inverted index is keyed on xxhash64(shingle), not the shingle
    // string: the exchange ships 8-byte longs instead of ~25-byte
    // strings and every downstream comparison is integer — the string
    // itself is never needed (only membership counts are). The
    // .distinct() after hashing restores SET semantics under a 64-bit
    // collision: two distinct shingles of one doc colliding would
    // otherwise leave duplicate (doc_id, s) rows that inflate both the
    // per-shingle df (perturbing the cap decision) and the per-doc
    // cardinality/intersection counts. With the distinct, a collision
    // merges two postings into their union — still wrong vs raw
    // strings (P ≈ 3·10⁻⁴ for ONE merged posting at 10^8 distinct
    // shingles, and the raw-string oracle would flag it) but
    // internally consistent. distinct() and the window below both ride
    // the single Exchange (hash(s) clusters (doc_id, s)); no extra
    // shuffle.
    jaccardPairsHashed(
      shingleDf.select(col("doc_id"), xxhash64(col("s")).as("s"))
        .repartition(col("s"))
        .distinct(),
      threshold, maxDocFreq)
  }

  /** `jaccardPairs` over an ALREADY-hashed, already-distinct
    * (doc_id, s:long) posting relation — the entry point for
    * MATERIALIZED shingle indexes (PairIndex): a bucketed index scan
    * is already hash-partitioned by `s`, so the df-cap window rides
    * the bucketing with no exchange. The carded kernel below (round
    * 16) then deliberately re-shuffles the POSTING stream twice more
    * (doc_id for the cardinality window, then the pinned-width s
    * repartition feeding the pair explosion) — posting-scale shuffles
    * bought to eliminate the two PAIR-scale cardinality joins the old
    * tail paid (~16× more data at the sf10 decade). Caller contract:
    * rows are distinct and `s` is `xxhash64` of the shingle string
    * (collision semantics identical to `jaccardPairs` by
    * construction). */
  def jaccardPairsHashed(sh0: DataFrame, threshold: Double,
                         maxDocFreq: Int = Int.MaxValue,
                         pairWidth: Option[Int] = None): DataFrame = {
    // df-cap BEFORE the posting-list aggregation: the window counts
    // docs per shingle and drops over-cap shingles, so every
    // collect_list state below — map-side partials included — is
    // bounded by maxDocFreq. The cap is the memory guard that makes
    // the posting-list plan safe at corpus scale; the uncapped path is
    // for small inputs/tests only (a corpus-hot shingle would collect
    // an unbounded list).
    val sh =
      if (maxDocFreq == Int.MaxValue) sh0
      else sh0
        .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("s"))))
        .filter(col("__df") <= maxDocFreq)
        .drop("__df")
    // Carry each doc's capped cardinality INTO the posting lists
    // (round-16, VERDICT item 1): the former tail re-joined the PAIR
    // stream against the per-doc cardinalities twice — at the sf10
    // decade that was 2 × ~440M-row sort-merge shuffles (6.5 GB of
    // exchange + ~4 GB disk spill) to attach 16 bytes per pair. One
    // window over the POSTING stream (27M rows at the same decade —
    // ~16× smaller) attaches n once; sort_array on (doc_id, n) structs
    // keeps the same doc_id order (ids are unique), and n1/n2 ride the
    // grouping keys (functionally dependent on the pair, so the
    // aggregate is unchanged). The pair stream is born fully scored —
    // zero joins from here to the result at ANY corpus size.
    val shN = sh.withColumn("n",
      count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val p = pairWidth.getOrElse(pairParallelism(sh0))
    require(p > 0, s"pairWidth must be positive: $p")
    val postings = shN
      .repartition(p, col("s"))
      .groupBy(col("s"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"))
    val pairs = postings
      .select(posexplode(col("ids")).as(Seq("__i", "d1")), col("ids"))
      .select(col("d1"),
        explode(slice(col("ids"), col("__i") + lit(2), size(col("ids")))).as("d2"))
      .select(col("d1").getField("doc_id").as("doc_id1"),
        col("d1").getField("n").as("n1"),
        col("d2").getField("doc_id").as("doc_id2"),
        col("d2").getField("n").as("n2"))
    // The explicit numbered repartition is load-bearing twice over:
    // (a) AQE sizes coalesced partitions from MAP-side bytes, which
    // undercounts explode-heavy stages by the pair fan-out — at sf10
    // it coalesced the pair aggregation to 32 partitions of ~14M pair
    // rows each, tripping the hash aggregate's sort-based fallback
    // (measured ~44 GB memory spill); a numbered repartition is exempt
    // from coalescing. (b) hash(doc_id1, doc_id2) already satisfies
    // the aggregate's clustering (n1/n2 are key-functional), so the
    // agg runs COMPLETE-mode after the exchange — no partial hash map
    // over the full exploded stream (partial combine only removed ~11%
    // of rows here; it cost a second full hash pass).
    val inter = pairs
      .repartition(p, col("doc_id1"), col("doc_id2"))
      .groupBy(col("doc_id1"), col("doc_id2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("n_inter"))
    val jac = col("n_inter").cast("double") / col("n_union").cast("double")
    inter
      .withColumn("n_union", col("n1") + col("n2") - col("n_inter"))
      .filter(jac >= threshold)
      .select(col("doc_id1"), col("doc_id2"), col("n_inter"), col("n_union"),
        // exact half-up integer rounding: round(double,4) diverges from
        // the oracle on half-boundary ratios (see ExactNum.roundRatio4)
        graft.functions.ExactNum.roundRatio4(col("n_inter"), col("n_union"))
          .as("jaccard_r4"))
  }

  /** Shuffle width for PAIR-VOLUME stages (the posting aggregation
    * that explodes into pairs, and the pair aggregation itself). AQE's
    * partition coalescing sizes partitions from MAP-side bytes, which
    * underestimates an explode-heavy stage by the full pair fan-out —
    * so these stages pin the session's scale-proportional initial
    * partition count (Bench and cluster deployments size
    * `spark.sql.adaptive.coalescePartitions.initialPartitionNum` with
    * the input) instead of letting AQE coalesce them back to default
    * parallelism.
    *
    * The pin is SESSION-scale, not input-scale (round-16 ADVICE): a
    * small corpus run inside a session sized for a large one inherits
    * the full pinned task count over near-empty partitions, because
    * the numbered repartition is deliberately exempt from AQE
    * coalescing. Callers that know their input is batch-scale pass
    * `pairWidth` to `jaccardPairsHashed` and override the pin; the
    * default stays session-scale because the pin exists precisely for
    * inputs whose pair fan-out AQE's map-byte estimate cannot see. */
  private def pairParallelism(df: DataFrame): Int = {
    val ss = df.sparkSession
    val base = ss.sessionState.conf.numShufflePartitions
    val init = ss.conf.getOption(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      .map(_.toInt).getOrElse(base)
    math.max(base, init)
  }

  /** Shared-shingle counts per ordered doc pair from a capped
    * (doc_id, s) posting relation: aggregate the postings per shingle
    * ONCE, then explode the bounded ordered pairs. Replaces the former
    * self-join, whose two sorted copies of the full index (dual sort +
    * sort-merge join) made wall time superlinear at the sf10 decade
    * (28× for 10× data): one aggregation over one sorted pass of the
    * index, pair volume unchanged (≤ C(maxDocFreq,2) per shingle,
    * linear in corpus size by construction). sort_array makes
    * doc_id1 < doc_id2 positional instead of a join predicate.
    *
    * Used by `PairIndex.advanceDocIndex` (delta rescore over candidate
    * shingles — batch-scale volumes, scored via `scoreJaccardPairs`'s
    * cardinality joins because the standing artifact cannot carry n:
    * a batch changes OTHER docs' capped cardinalities). The full-run
    * path (`jaccardPairsHashed`) instead carries n inside the posting
    * structs — same math on both paths, pinned row-identical by
    * PairIndexSpec. */
  private[operators] def pairIntersections(sh: DataFrame): DataFrame = {
    val postings = sh.groupBy(col("s"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"))
    val pairs = postings
      .select(posexplode(col("ids")).as(Seq("__i", "doc_id1")), col("ids"))
      .select(col("doc_id1"),
        explode(slice(col("ids"), col("__i") + lit(2), size(col("ids")))).as("doc_id2"))
    pairs
      .groupBy(col("doc_id1"), col("doc_id2"))
      .agg(count(lit(1)).as("n_inter"))
  }

  /** Scoring tail shared by the full and incremental Jaccard paths:
    * join per-doc capped-universe cardinalities `card` (doc_id, n) onto
    * the intersection counts, threshold, and round. `card` must cover
    * every doc appearing in `inter` (inner joins). */
  private[operators] def scoreJaccardPairs(inter: DataFrame, card: DataFrame,
                                           threshold: Double): DataFrame = {
    val jac = col("n_inter").cast("double") / col("n_union").cast("double")
    // merge hints, not broadcasts, for the cardinality joins: Catalyst's
    // static size estimate of the pair aggregate shrinks below the
    // broadcast threshold (aggregates scale the child estimate down), so
    // without the hint the planner broadcasts the PAIR table — measured
    // as a 10 GiB broadcast attempt at sf3, past the 8 GiB hard limit —
    // and AQE never demotes a statically planned broadcast join (its
    // cost evaluator rejects replans that add shuffles). Sort-merge is
    // also the only plan that survives corpus scale: at billions of
    // docs BOTH sides (pair counts and per-doc cardinalities) are far
    // past any broadcast limit, and a broadcast(card) hint would fail
    // hard instead of degrading to a linear shuffle.
    inter.hint("merge")
      .join(card.as("c1"), col("doc_id1") === col("c1.doc_id"))
      .hint("merge")
      .join(card.as("c2"), col("doc_id2") === col("c2.doc_id"))
      .withColumn("n_union", col("c1.n") + col("c2.n") - col("n_inter"))
      .filter(jac >= threshold)
      .select(col("doc_id1"), col("doc_id2"), col("n_inter"), col("n_union"),
        // exact half-up integer rounding: round(double,4) diverges from
        // the oracle on half-boundary ratios (see ExactNum.roundRatio4)
        graft.functions.ExactNum.roundRatio4(col("n_inter"), col("n_union"))
          .as("jaccard_r4"))
  }

  // ---------------- winnowing ----------------

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003,
    * the MOSS algorithm): hash every k-gram, slide a window of `w`
    * hashes, keep each window's minimum — guarantees any match of
    * length ≥ w+k−1 tokens between two documents shares a fingerprint,
    * while storing only ~2/(w+1) of the hashes. The standard machinery
    * for benchmark-contamination detection over a training corpus:
    * winnow both sides, join on the fingerprint (d06-style bucket
    * join), verify candidates exactly.
    *
    * Deterministic md5-derived hashes (oracle-exact, no seed state);
    * selection is per-row array work (narrow, no shuffle) — the
    * output (doc_id, fingerprint) index is what gets joined at scale.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame = {
    // native kernel (plans.WinnowExpr): one byte scan per row — md5 of
    // each k-gram span via a thread-local digest, monotonic-deque
    // sliding minima, open-addressing distinct. The declarative twin
    // below is its equivalence baseline; the interpreted
    // md5→hex→conv round trip per gram and per-window slice()
    // allocation made the hot path GC-bound at the sf10 decade.
    import org.apache.spark.sql.GraftColumnBridge
    df.select(col(idCol).as("doc_id"),
      explode(GraftColumnBridge.column(graft.plans.WinnowExpr(
        GraftColumnBridge.expression(col(textCol).cast("string")), k, w)))
        .as("fingerprint"))
  }

  /** Interpreted reference implementation of `winnowFingerprints`
    * (kept for the equivalence property spec; do not use on hot
    * paths). Every array feeding a lambda is materialized as a column
    * first: lambdas re-evaluate non-attribute operands per element (no
    * CSE through lambda bodies), so inlining the token array would
    * re-split per k-gram and inlining the hash array would re-md5 per
    * window — each a quadratic blowup (the un-materialized form
    * measured >10 min vs ~2 s at sf0.1). */
  def winnowFingerprintsDeclarative(df: DataFrame, idCol: String, textCol: String,
                                    k: Int = 3, w: Int = 4): DataFrame = {
    val withGrams = df.select(col(idCol).as("doc_id"),
      TextAnalysis.shinglesCol(col(textCol), k).as("__g"))
    val hashed = withGrams.select(col("doc_id"),
      transform(col("__g"), g =>
        conv(substring(md5(g), 1, 8), 16, 10).cast("long")).as("__h"))
    val nh = size(col("__h"))
    // fewer than w hashes: the whole doc is one window
    val mins = when(nh === 0, array().cast("array<long>"))
      .otherwise(transform(
        sequence(lit(1), greatest(nh - (w - 1), lit(1))),
        j => array_min(slice(col("__h"), j, least(lit(w), nh)))))
    hashed.select(col("doc_id"), explode(array_distinct(mins)).as("fingerprint"))
  }

  // ---------------- exact-substring matches (d35) ----------------

  /** Exact-substring contamination matches (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" —
    * the ExactSubstr granularity): every maximal run of `minTokens`
    * or more consecutive tokens shared VERBATIM between two documents,
    * reported as (doc_id1, doc_id2, pos1, pos2, match_tokens) with
    * 1-based token positions and doc_id1 < doc_id2. This is the
    * training-data-hygiene step the approximate family cannot pin
    * down: winnowing (d17) guarantees a shared fingerprint for any
    * ≥ w+k−1-token overlap but neither localizes nor measures it, and
    * Jaccard (d07) is order-blind; benchmark-contamination removal
    * wants the exact span.
    *
    * Distributed shape — the paper's suffix array is a single-machine
    * structure, so the Spark form is a k-gram chain join + adjacency-
    * run confirmation, never all-pairs:
    *  1. positional k-grams: (doc_id, pos, md5(gram)) — one narrow
    *     generator pass (native ShinglesExpr + posexplode), no
    *     distinct (multiplicity and position both matter here, unlike
    *     the set-semantics Jaccard path);
    *  2. occurrence cap: grams above `maxOcc` total occurrences are
    *     dropped from the universe (window over the gram key — rides
    *     the same exchange). A corpus-hot boilerplate gram is a
    *     single-key O(occ²) pair explosion at 100 TB and carries no
    *     contamination signal; the result is exact over the capped
    *     gram universe, mirrored verbatim in the d35 oracle (same
    *     consistent-universe contract as jaccardPairs' maxDocFreq);
    *  3. posting-list pair explosion per gram (the jaccardPairsHashed
    *     kernel shape): cross-doc occurrence pairs, ≤ C(maxOcc,2) per
    *     gram — linear in corpus size at fixed duplication density;
    *  4. run confirmation: two matches are adjacent iff both positions
    *     advance by one, i.e. they lie on the same DIAGONAL
    *     (pos1 − pos2) with consecutive pos1 — the classic
    *     gaps-and-islands window per (doc_id1, doc_id2, diag), then
    *     one aggregate per island. A run of R shared k-grams certifies
    *     an exact common substring of R+k−1 tokens; maximal islands
    *     with R+k−1 ≥ minTokens are emitted.
    *
    * The join key is the full md5 hex of the gram: effectively
    * collision-free (2⁻¹²⁸), engine-independent, and byte-comparable
    * to the gram string itself at k=5 (32 vs ~30 bytes), so "exact"
    * is not hash-approximate in any practical sense; a production
    * deployment can binary-pack the digest to 16 bytes. Both
    * pair-volume shuffles (posting aggregation, island window) run at
    * the session's pinned pair width — AQE would coalesce them from
    * pre-explosion map bytes (the round-16 lesson); `pairWidth`
    * overrides for batch-scale invocations.
    *
    * Reference for the operator inventory: this is the one LLM-pipeline
    * capability round-16's VERDICT called out as missing (item 3). */
  def exactSubstringMatches(df: DataFrame, idCol: String, textCol: String,
                            minTokens: Int, k: Int = 5, maxOcc: Int = 100,
                            pairWidth: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(minTokens >= k,
      s"minTokens ($minTokens) must be >= gram size k ($k)")
    require(maxOcc >= 2, s"maxOcc must allow cross-doc pairs: $maxOcc")
    val p = pairWidth.getOrElse(pairParallelism(df))
    require(p > 0, s"pairWidth must be positive: $p")
    // 1-based positions so the oracle's tokens[i] indexing mirrors
    // directly; md5 of the byte-span gram = md5 of the space-joined
    // token form on the single-space-normalized corpus. The
    // fingerprint is stored as 16-byte BINARY (unhex of the hex form),
    // not the 32-byte hex string (round-20, guide §2.3 narrower
    // types): f is the dominant column of the gram stream — the
    // kernel's one corpus-scale shuffle — and it never reaches any
    // output, so halving it halves the exchange and the posting
    // aggregation state with bit-identical match semantics (same
    // 128 bits).
    val grams = df
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextAnalysis.shinglesCol(col(textCol), k)).as(Seq("pos", "g")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        unhex(md5(col("g"))).as("f"))
    // ONE numbered repartition on the gram key serves the occurrence
    // aggregate, the cap filter AND the posting aggregation (all are
    // clustered by the same f) — pinned pair width because this
    // exchange feeds the pair explosion, whose fan-out AQE's map-byte
    // coalescing cannot see. The occurrence cap runs as a bucket-local
    // per-gram aggregate + semi join on the same partitioning
    // (round-20, guide §1.2) instead of a window count — the window
    // planned a SORT of the full gram stream; the aggregate is
    // sort-free and AQE reuses the gram exchange between the two
    // reads. sort_array orders by (doc_id, pos), so the sliced pair
    // explosion below yields doc_id1 <= doc_id2 positionally and the
    // inequality filter leaves strictly cross-doc pairs.
    val widened = grams.repartition(p, col("f"))
    val underCap = widened
      .groupBy(col("f")).agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") <= maxOcc)
      .select(col("f"))
    val capped = widened
      .join(underCap.hint("shuffle_hash"), Seq("f"), "left_semi")
    val postings = capped
      .groupBy(col("f"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("pos")))).as("os"))
      .filter(size(col("os")) > 1)
      .select(col("os"))
    val pairs = postings
      .select(posexplode(col("os")).as(Seq("__i", "a")), col("os"))
      .select(col("a"),
        explode(slice(col("os"), col("__i") + lit(2), size(col("os")))).as("b"))
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id1"), col("a.pos").as("pos1"),
        col("b.doc_id").as("doc_id2"), col("b.pos").as("pos2"))
    maximalRuns(pairs, "doc_id1", "pos1", "doc_id2", "pos2",
      p, k, minTokens)
  }

  /** Diagonal gaps-and-islands run confirmation shared by the
    * within-corpus (d35) and cross-corpus (d36) substring kernels:
    * within one (id1, id2, diagonal = pos1 − pos2) group, pos1 is
    * unique (a position carries exactly one gram), so pos1 − rank is
    * constant exactly along a maximal consecutive run — one window,
    * one aggregate per island, emit runs of ≥ minTokens tokens. The
    * numbered repartition satisfies both the window's and the
    * aggregation's required clustering (the group key set extends the
    * partition keys), so the whole confirmation is ONE pair-volume
    * shuffle at pinned width. */
  private def maximalRuns(pairs: DataFrame, id1: String, pos1: String,
                          id2: String, pos2: String,
                          p: Int, k: Int, minTokens: Int): DataFrame = {
    val diag = pairs.withColumn("__diag", col(pos1) - col(pos2))
      .repartition(p, col(id1), col(id2), col("__diag"))
    val w = Window.partitionBy(col(id1), col(id2), col("__diag"))
      .orderBy(col(pos1))
    diag
      .withColumn("__grp", col(pos1) - row_number().over(w))
      .groupBy(col(id1), col(id2), col("__diag"), col("__grp"))
      .agg(min(col(pos1)).as(pos1), min(col(pos2)).as(pos2),
        (count(lit(1)) + lit(k - 1)).as("match_tokens"))
      .filter(col("match_tokens") >= minTokens)
      .select(col(id1), col(id2), col(pos1), col(pos2), col("match_tokens"))
  }

  /** Cross-corpus exact-substring decontamination (d36) — the actual
    * Lee et al. 2022 deployment shape: find every maximal verbatim run
    * of `minTokens`+ tokens a PROBE set (an eval benchmark, a test
    * split) shares with a training CORPUS, so the contaminated spans
    * can be excised before training. `exactSubstringMatches` is the
    * within-corpus audit; this is the probe-vs-corpus sweep a release
    * pipeline runs per benchmark, and it must cost Θ(corpus scan +
    * probe-proportional work), never corpus × corpus.
    *
    * Scale shape, on top of the d35 kernel:
    *  - both sides' positional k-grams union into ONE exchange keyed
    *    on the gram digest; side rides the rows as a boolean;
    *  - corpus-only grams are pruned BEFORE the posting-list
    *    aggregation by a shuffled-hash semi-join against the probe's
    *    distinct gram keys (the d13/crossJaccardPairs lesson: without
    *    it the aggregation builds collect_list state for the ENTIRE
    *    corpus index; with it, state is bounded by grams the probe
    *    actually carries — probe-proportional). shuffle_hash, not
    *    broadcast: probe keys are Θ(probe) and a statically committed
    *    broadcast is the 8 GiB-cliff class;
    *  - the occurrence cap counts BOTH sides' occurrences of the
    *    surviving grams — identical to capping before the prune for
    *    every gram that can produce a pair (the prune is per-gram,
    *    not per-row), so the oracle mirrors the full-universe cap;
    *  - per gram, probe × corpus occurrence pairs explode (≤
    *    maxOcc²/4 each), then the same diagonal gaps-and-islands
    *    confirmation as d35, keyed (probe_id, corpus_id, diag).
    *
    * Output: (probe_id, corpus_id, probe_pos, corpus_pos,
    * match_tokens), 1-based positions, one row per maximal run ≥
    * minTokens. */
  def exactSubstringContamination(corpus: DataFrame, probe: DataFrame,
                                  idCol: String, textCol: String,
                                  minTokens: Int, k: Int = 5,
                                  maxOcc: Int = 100,
                                  pairWidth: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(minTokens >= k,
      s"minTokens ($minTokens) must be >= gram size k ($k)")
    require(maxOcc >= 2, s"maxOcc must allow cross-side pairs: $maxOcc")
    val p = pairWidth.getOrElse(pairParallelism(corpus))
    require(p > 0, s"pairWidth must be positive: $p")
    def grams(df: DataFrame, side: Int): DataFrame = df
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextAnalysis.shinglesCol(col(textCol), k)).as(Seq("pos", "g")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        unhex(md5(col("g"))).as("f"), lit(side).as("__side"))
    val tagged = grams(probe, 1).unionByName(grams(corpus, 0))
    // probe gram keys recomputed from the small side (narrow scan, no
    // dependence on the big union Exchange)
    val probeKeys = probe
      .select(explode(TextAnalysis.shinglesCol(col(textCol), k)).as("g"))
      .select(unhex(md5(col("g"))).as("f")).distinct()
    // Gram-stream width note: the numbered repartition below is
    // DEFENSIVE — the optimizer pushes the semi join through both it
    // and the union (PushDownLeftSemiAntiJoin), plans one
    // ShuffledHashJoin per union branch, and then removes the
    // repartition as redundant because Spark 4 propagates the
    // branches' compatible hash(f) partitioning through the Union —
    // the window and posting aggregation ride the joins' exchanges
    // (verified in the d36 plan assert). Those exchanges are
    // AQE-coalescible by gram map bytes, which is SAFE here, unlike
    // d35's corpus×corpus kernel: d36's pair fan-out is
    // probe-bounded (probe×corpus occurrences per gram, grams pruned
    // to the probe's universe), so the post-aggregation explode is
    // small relative to the corpus-scale gram stream the coalescing
    // actually measures. The diagonal island stage below keeps its
    // own pinned width. If a future Spark stops propagating union
    // partitioning, this repartition materializes and pins the width
    // instead — either plan is sound.
    // Occurrence cap via a bucket-local per-gram aggregate + semi join
    // instead of a window count (round-20, guide §1.2): the window
    // planned as a SORT of the corpus-scale gram stream before the
    // per-f count — the sweep's one full-stream sort — while the
    // aggregate rides the hash(f) exchange sort-free, and the cap
    // filter becomes a semi join against the (gram-scale) under-cap
    // key set on the same partitioning. AQE reuses the gram exchange
    // between the two reads, so the explode/md5 map side still runs
    // once; rows kept are identical (the cap is per-gram).
    val prunedGrams = tagged
      .repartition(p, col("f"))
      .join(probeKeys.hint("shuffle_hash"), Seq("f"), "left_semi")
    val underCapKeys = prunedGrams
      .groupBy(col("f")).agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") <= maxOcc)
      .select(col("f"))
    val capped = prunedGrams
      .join(underCapKeys.hint("shuffle_hash"), Seq("f"), "left_semi")
    val postings = capped
      .groupBy(col("f"))
      .agg(
        collect_list(when(col("__side") === 1,
          struct(col("doc_id"), col("pos")))).as("ps"),
        collect_list(when(col("__side") === 0,
          struct(col("doc_id"), col("pos")))).as("cs"))
      .filter(size(col("ps")) > 0 && size(col("cs")) > 0)
      .select(col("ps"), col("cs"))
    // the same-id guard protects the natural misuse of sweeping an
    // eval split against the FULL corpus without excluding the eval
    // rows (probe ⊆ corpus): a doc id present on BOTH sides is the
    // same document and must not match itself — without this, every
    // such probe doc self-matches end-to-end and `decontaminate`
    // silently erases it to the empty string. Distinct-id text
    // duplicates still report (that IS contamination).
    val pairs = postings
      .select(explode(col("ps")).as("a"), col("cs"))
      .select(col("a"), explode(col("cs")).as("b"))
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("probe_id"), col("a.pos").as("probe_pos"),
        col("b.doc_id").as("corpus_id"), col("b.pos").as("corpus_pos"))
    maximalRuns(pairs, "probe_id", "probe_pos", "corpus_id", "corpus_pos",
      p, k, minTokens)
  }

  /** Cap telemetry for the decontamination sweep (d40, round-17
    * ADVICE): the occurrence cap can silently split or drop a genuine
    * contaminated run that passes through a corpus-hot gram — for a
    * hygiene operator that is a recall caveat callers must SEE, not
    * infer. This report quantifies exactly what the cap removed from
    * this corpus/probe pairing: how many probe-relevant gram keys
    * exist, how many the cap dropped, how many gram occurrences
    * vanished with them, and how many PROBE documents carried at
    * least one dropped gram (the docs whose excision could be
    * under-complete). Same stages as the sweep up to the cap (one
    * gram exchange + the shuffled-hash probe-key prune), then one
    * aggregate; driver-verified with a from-scratch mirror. */
  def contaminationCapReport(corpus: DataFrame, probe: DataFrame,
                             idCol: String, textCol: String,
                             k: Int = 5, maxOcc: Int = 100,
                             pairWidth: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxOcc >= 2, s"maxOcc must allow cross-side pairs: $maxOcc")
    val p = pairWidth.getOrElse(pairParallelism(corpus))
    def grams(df: DataFrame, side: Int): DataFrame = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.shinglesCol(col(textCol), k)).as("g"))
      .select(col("doc_id"), unhex(md5(col("g"))).as("f"), lit(side).as("__side"))
    val tagged = grams(probe, 1).unionByName(grams(corpus, 0))
    val probeKeys = probe
      .select(explode(TextAnalysis.shinglesCol(col(textCol), k)).as("g"))
      .select(unhex(md5(col("g"))).as("f")).distinct()
    // prune exactly like the sweep; occurrence counts come from a
    // bucket-local GROUP BY on the same hash(f) exchange. Round-20
    // (guide §1.2 per-task work): the former shape — a window count
    // over partition-by-f followed by one aggregate with THREE
    // count_distincts — planned as Sort + Window + Expand(×4) over the
    // corpus-scale gram stream, measured as 14.3 CPU-s at 32 threads
    // vs 2.6 at 8 on a 12 MB stream (the stage is memory-bound, and
    // ×4-expanded sort/window traffic is what it is bound ON). The
    // per-gram aggregate needs no sort and no Expand; the three gram
    // totals are one pass over the ~|grams| relation, and the probe-doc
    // count re-reads the pruned stream against the (small) over-cap
    // key set — AQE reuses the gram exchange, so the map side runs
    // once.
    val pruned = tagged
      .repartition(p, col("f"))
      .join(probeKeys.hint("shuffle_hash"), Seq("f"), "left_semi")
    val perF = pruned.groupBy(col("f")).agg(count(lit(1)).as("__occ"))
    val gramTotals = perF.agg(
      count(lit(1)).as("grams_surviving_prune"),
      count(when(col("__occ") > maxOcc, lit(1))).as("grams_over_cap"),
      sum(when(col("__occ") > maxOcc, col("__occ")).otherwise(0L))
        .as("occurrences_dropped"))
    val overCapKeys = perF.filter(col("__occ") > maxOcc).select(col("f"))
    val probeDocs = pruned
      .filter(col("__side") === 1)
      .join(overCapKeys.hint("shuffle_hash"), Seq("f"), "left_semi")
      .agg(count_distinct(col("doc_id")).as("probe_docs_touched"))
    gramTotals.crossJoin(probeDocs)
      .select(col("grams_surviving_prune"), col("grams_over_cap"),
        col("occurrences_dropped"), col("probe_docs_touched"))
  }

  /** Span excision (d37, the back half of decontamination): given the
    * probe-side match spans (`exactSubstringContamination`'s output
    * shape — 1-based `probe_pos` + `match_tokens` per run), rewrite
    * each probe document with every covered token REMOVED, and report
    * what was cut. Lee et al. 2022 drop the duplicated substring and
    * keep the remainder — cutting the span, not the document, is what
    * preserves the rest of an eval-contaminated page for training.
    *
    * Shape: spans aggregate per probe doc (collect_list of (start,
    * len) structs — bounded by the doc's own match count, a row-local
    * list), one broadcast-or-shuffle join back onto the probe docs,
    * then a single narrow pass per row: token i is kept iff NO span
    * covers it (an indexed `filter` lambda over the token array with
    * an `exists` over the span list — O(tokens × spans) per row,
    * spans per doc are few by construction). No merging pass is
    * needed: coverage-by-any-span is already the union of overlapping
    * spans. Untouched probe docs pass through with zero counts —
    * the output is the FULL probe set, rewritten.
    *
    * Output: (doc_id, clean_md5, n_tokens_kept, n_tokens_removed,
    * n_spans) — the md5 of the space-rejoined kept tokens pins the
    * rewrite byte-exactly without shipping the text. */
  def exciseSpans(probe: DataFrame, idCol: String, textCol: String,
                  spans: DataFrame): DataFrame = {
    // the span aggregate's id column is renamed to a reserved name
    // BEFORE the join: the natural chaining case passes a probe whose
    // own idCol is `probe_id` (exactly what exactSubstringContamination
    // emits), and keeping both sides' `probe_id` live would make the
    // output projection ambiguous (round-17 ADVICE)
    val perDoc = spans
      .groupBy(col("probe_id").as("__span_doc_id"))
      .agg(collect_list(struct(col("probe_pos").as("s"),
        (col("probe_pos") + col("match_tokens") - 1).as("e"))).as("__spans"),
        count(lit(1)).as("__n_spans"))
    val toks = split(col(textCol), " ")
    // indexed filter: i is 0-based, span positions 1-based
    val kept = filter(col("__toks"), (t, i) =>
      !exists(col("__spans"), s =>
        i + 1 >= s.getField("s") && i + 1 <= s.getField("e")))
    probe
      .join(perDoc, probe(idCol) === perDoc("__span_doc_id"), "left")
      .withColumn("__toks", toks)
      .withColumn("__kept",
        when(col("__spans").isNull, col("__toks")).otherwise(kept))
      .select(probe(idCol),
        md5(array_join(col("__kept"), " ")).as("clean_md5"),
        size(col("__kept")).cast("long").as("n_tokens_kept"),
        (size(col("__toks")) - size(col("__kept"))).cast("long")
          .as("n_tokens_removed"),
        coalesce(col("__n_spans"), lit(0L)).as("n_spans"))
  }

  /** End-to-end decontamination (d37 registered form): sweep the
    * probe against the corpus (`exactSubstringContamination`), then
    * excise every matched span from the probe docs. One composition,
    * both halves oracle-mirrored from scratch. */
  def decontaminate(corpus: DataFrame, probe: DataFrame,
                    idCol: String, textCol: String,
                    minTokens: Int, k: Int = 5, maxOcc: Int = 100,
                    pairWidth: Option[Int] = None): DataFrame =
    exciseSpans(probe, idCol, textCol,
      exactSubstringContamination(corpus, probe, idCol, textCol,
        minTokens, k, maxOcc, pairWidth))

  /** Contamination-aware dataset split (d42): the composition a
    * release pipeline actually ships — every corpus document gets its
    * deterministic content-hash split (d11's train/val/test rule),
    * EXCEPT documents sharing a ≥ `minTokens` verbatim run with the
    * probe/eval set (the d36 sweep), which are QUARANTINED out of
    * every split. Splitting and decontamination are otherwise
    * independently correct but composed wrong in practice (hash-split
    * first, scrub later, leak through the val set); doing both in one
    * declarative contract makes the leak structurally impossible and
    * driver-checkable. Scale shape: the sweep is probe-proportional
    * (d36), the contaminated-id set is Θ(matches) and joins back as
    * one equi-join, the split is a per-row expression — nothing here
    * adds a corpus-scale stage beyond the sweep itself. */
  def contaminationAwareSplit(corpus: DataFrame, probe: DataFrame,
                              idCol: String, textCol: String,
                              minTokens: Int, k: Int = 5, maxOcc: Int = 100,
                              pairWidth: Option[Int] = None): DataFrame = {
    val contaminated = exactSubstringContamination(corpus, probe,
        idCol, textCol, minTokens, k, maxOcc, pairWidth)
      .select(col("corpus_id").as("__cid")).distinct()
      .withColumn("__cont", lit(true))
    corpus
      .select(col(idCol).cast("long").as(idCol),
        TextAnalysis.hashSplit(TextAnalysis.textHash(col(textCol)))
          .as("__split0"))
      .join(contaminated, col(idCol) === col("__cid"), "left")
      .select(col(idCol),
        when(col("__cont"), lit("quarantined")).otherwise(col("__split0"))
          .as("split"),
        coalesce(col("__cont"), lit(false)).as("contaminated"))
  }

  // ---------------- incremental (batch-vs-corpus) ----------------

  /** Cross-corpus Jaccard pairs: (incoming doc, corpus doc) pairs that
    * share at least one shingle, scored over the df-capped shingle
    * universe of the COMBINED corpus (a corpus-hot shingle carries no
    * dedup signal whichever side it comes from — same rationale and
    * same windowed cap as `jaccardPairs`, mirrored in the d13 oracle).
    *
    * Scale shape: both sides union into ONE Exchange partitioned on
    * the shingle; the df-cap window and the incoming×corpus equi-join
    * all ride that partitioning, so the incremental pass costs one
    * shuffle of the combined shingle index — never all-pairs, and no
    * per-side re-shingling. */
  def crossJaccardPairs(shIncoming: DataFrame, shCorpus: DataFrame,
                        threshold: Double,
                        maxDocFreq: Int = Int.MaxValue): DataFrame = {
    // same internal xxhash64 key as jaccardPairs, same set-restoring
    // .distinct() (rides the Exchange), and the same posting-list plan:
    // one aggregation collects BOTH sides' postings per shingle
    // (collect_list skips the nulls the `when` leaves for the other
    // side), then the bounded incoming×corpus cross product explodes
    // per shingle — no self-join, one sorted pass over the combined
    // index. The combined df-cap bounds every list at maxDocFreq.
    val tagged = shIncoming
      .select(col("doc_id"), xxhash64(col("s")).as("s"), lit(1).as("__side"))
      .unionByName(shCorpus
        .select(col("doc_id"), xxhash64(col("s")).as("s"), lit(0).as("__side")))
      .repartition(col("s"))
      .distinct()
    val capped =
      if (maxDocFreq == Int.MaxValue) tagged
      else tagged
        .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("s"))))
        .filter(col("__df") <= maxDocFreq)
        .drop("__df")
    val card = capped.groupBy(col("__side"), col("doc_id")).agg(count(lit(1)).as("n"))
    // Prune corpus-only shingles BEFORE the posting-list aggregation:
    // a shingle no incoming doc carries can never produce a pair (its
    // `inc` list would be empty and the filter below drops it), yet
    // without this semi-join the groupBy aggregates collect_list state
    // for the ENTIRE corpus index — the first-cut posting-list plan
    // regressed d13 to 20× decade growth exactly this way (the old
    // equi-join had pruned those shingles implicitly). The build side
    // is the batch's distinct 8-byte shingle hashes, recomputed from
    // the small incoming side (narrow scan, no dependence on the big
    // combined Exchange). shuffle_hash, not broadcast: batch shingle
    // keys are Θ(batch), so a statically committed broadcast is the
    // 8 GiB-cliff class found at sf3 for large batches — a shuffled
    // hash semi join instead re-uses the combined index's existing
    // hash(s) partitioning (no corpus re-shuffle, NO corpus sort —
    // sort-merge would have to sort the whole index), ships only the
    // batch keys, and builds a per-partition hash table bounded by
    // batchKeys/partitions. `card` stays on the FULL capped index —
    // n2 must count all of a corpus doc's capped shingles for
    // correct union cardinalities, not just the incoming-present ones.
    val incKeys = shIncoming.select(xxhash64(col("s")).as("s")).distinct()
    val postings = capped.join(incKeys.hint("shuffle_hash"), Seq("s"), "left_semi")
      .groupBy(col("s")).agg(
        collect_list(when(col("__side") === 1, col("doc_id"))).as("inc"),
        collect_list(when(col("__side") === 0, col("doc_id"))).as("cor"))
      .filter(size(col("inc")) > 0 && size(col("cor")) > 0)
      .select(col("inc"), col("cor"))
    val inter = postings
      .select(explode(col("inc")).as("inc_id"), col("cor"))
      .select(col("inc_id"), explode(col("cor")).as("cor_id"))
      .groupBy(col("inc_id"), col("cor_id"))
      .agg(count(lit(1)).as("n_inter"))
    val jac = col("n_inter").cast("double") / col("n_union").cast("double")
    // same merge hints as jaccardPairs (see there): the pair aggregate's
    // static size estimate is unreliably small, and a mis-chosen
    // broadcast of the pair side fails hard past 8 GiB instead of
    // degrading; when the incremental batch really is tiny the sort
    // sides are tiny too, so the hint costs nothing in that case.
    inter.hint("merge")
      .join(card.filter(col("__side") === 1).select(col("doc_id"), col("n").as("n1")),
        col("inc_id") === col("doc_id")).drop("doc_id")
      .hint("merge")
      .join(card.filter(col("__side") === 0).select(col("doc_id"), col("n").as("n2")),
        col("cor_id") === col("doc_id")).drop("doc_id")
      .withColumn("n_union", col("n1") + col("n2") - col("n_inter"))
      .filter(jac >= threshold)
      .select(col("inc_id"), col("cor_id"), col("n_inter"), col("n_union"),
        graft.functions.ExactNum.roundRatio4(col("n_inter"), col("n_union"))
          .as("jaccard_r4"))
  }

  /** Incremental dedup — the daily-crawl workflow at corpus scale: a
    * new batch is deduplicated against an EXISTING corpus without
    * re-deduplicating the corpus itself. Survivors of `incoming` are
    * returned; `corpus` is only read (its canonical hashes and its
    * shingle index — at 100 TB both are the precomputed artifacts an
    * incremental pipeline maintains between runs).
    *
    * Contract, in order:
    *  1. exact dedup WITHIN the batch (keep smallest id);
    *  2. drop batch docs whose canonical hash exists in the corpus
    *     (anti-join on the hash — one shuffle, or broadcast when the
    *     corpus hash set is small);
    *  3. drop batch docs Jaccard-similar (≥ threshold over the
    *     df-capped combined shingle universe) to ANY corpus doc.
    * Near-dups WITHIN the batch are deliberately retained — that's
    * `CorpusPipeline.curate`'s job on the batch beforehand if wanted;
    * keeping the two policies separate keeps both oracle-exact. */
  def dedupIncrement(corpus: DataFrame, incoming: DataFrame,
                     idCol: String, textCol: String,
                     jaccardThreshold: Double = 0.6,
                     maxDocFreq: Int = 100,
                     shingleK: Int = 3): DataFrame = {
    val batch = dropExactDuplicates(incoming, idCol, textCol)
    // merge hint: the corpus hash set is Θ(corpus docs) and its
    // distinct-aggregate size estimate is unreliably small, so the
    // planner would commit it to a broadcast AQE can never demote —
    // the 8 GiB-cliff class found at sf3 (and this subtree is
    // duplicated wherever `fresh` is reused, so the broadcast would
    // be built more than once). Sort-merge shuffles batch-vs-corpus
    // hashes linearly at any corpus size.
    val corpusHashes = corpus
      .select(TextAnalysis.textHash(col(textCol)).as("__h")).distinct()
    val fresh = batch
      .withColumn("__h", TextAnalysis.textHash(col(textCol)))
      .join(corpusHashes.hint("merge"), Seq("__h"), "left_anti")
      .drop("__h")
    val nearIds = crossJaccardPairs(
        shingles(fresh, idCol, textCol, shingleK),
        shingles(corpus, idCol, textCol, shingleK),
        jaccardThreshold, maxDocFreq)
      .select(col("inc_id").as(idCol))
      .distinct()
    // same class: nearIds is batch-bounded in practice but estimated
    // post-aggregation — merge keeps the anti join cliff-free at any
    // batch size, and tiny sides make tiny sorts.
    fresh.join(nearIds.hint("merge"), Seq(idCol), "left_anti")
  }

  // ---------------- SimHash ----------------

  /** 64-bit SimHash: per token take the first 64 bits of md5 (16 hex
    * chars), per bit position sum ±1 votes across tokens (with
    * multiplicity), bit = sign of the sum. Cross-engine exact: integer
    * votes, no floats. The fingerprint is returned as one signed long
    * (bit 63 set → negative — harmless: banding masks after the shift
    * and hamming uses xor+bit_count, both sign-agnostic).
    *
    * 64 bits (not 16): at corpus scale a 16-bit space has only 65,536
    * distinct fingerprints, so banding buckets degenerate into mega-keys
    * and the candidate join trends toward all-pairs. 64 bits gives
    * `simhashPairs` room for hamming-radius-derived bands (4×16-bit at
    * the default r=3) whose collision probability actually reflects
    * similarity.
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // The 64-bit digest prefix is carried as two 32-bit words (hi = hex
    // chars 1-8, lo = chars 9-16): conv() of 8 hex chars always fits a
    // long, avoiding unsigned-64 overflow, and the words are
    // materialized ONCE before the aggregation — the 64 vote aggregates
    // would otherwise each re-evaluate the md5 (Spark does no CSE
    // across aggregate exprs).
    val tok = df.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .select(col("doc_id"), substring(md5(col("t")), 1, 16).as("h"))
      .select(col("doc_id"),
        conv(substring(col("h"), 1, 8), 16, 10).cast("long").as("vhi"),
        conv(substring(col("h"), 9, 8), 16, 10).cast("long").as("vlo"))
    val votes = (0 until 64).map { b =>
      val word = if (b < 32) col("vlo") else col("vhi")
      sum(shiftright(word, b % 32).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$b")
    }
    val agg = tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    // reduce is left-associative over b = 0..63, so partial sums stay in
    // [0, 2^63-1] until the final (possibly negative) bit-63 term — no
    // overflow under ANSI mode.
    val sim = (0 until 64).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), sim.cast("long").as("simhash"))
  }

  /** SimHash near-dup pairs within a hamming radius. Scale path: block on
    * bit-range bands (pigeonhole: a pair within hamming r of 64 bits
    * shares at least one of r+1 disjoint bands untouched), then verify
    * with bit_count on candidates only.
    *
    * Band width is DERIVED from maxHamming — exactly r+1 bands of
    * 64/(r+1) bits, the widest (most selective) banding that is still
    * pigeonhole-complete. Using more, narrower bands than completeness
    * needs would inflate random collisions: e.g. 8×8-bit bands collide a
    * random pair on some band with probability ~1-(255/256)^8 ≈ 3%, so
    * the candidate join would still be ~3% of all-pairs at corpus
    * scale, whereas the default r=3 gets 4×16-bit bands at ~6e-5.
    * Candidate volume therefore tracks true signature agreement plus a
    * ~(r+1)·2^-(64/(r+1)) random floor — small for r ≤ 7, but banding
    * is a candidate FILTER, not a skew guarantee: a corpus of
    * near-identical documents still concentrates in few buckets. */
  def simhashPairs(sim: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"bit-range blocking supports hamming 0..7 (bands of >=8 bits), got $maxHamming")
    val nBands = maxHamming + 1
    val bounds = (0 to nBands).map(i => i * 64 / nBands) // partition of bits 0..63
    val bands = (0 until nBands).map { nb =>
      val lo = bounds(nb)
      val width = bounds(nb + 1) - lo
      val mask = if (width == 64) -1L else (1L << width) - 1L
      // arithmetic shift on a negative long is fine: the mask discards
      // the sign-extended high bits.
      struct(lit(nb).as("band"),
        shiftright(col("simhash"), lo).bitwiseAND(lit(mask)).as("bk"))
    }
    val banded = sim
      .select(col("doc_id"), col("simhash"), explode(array(bands: _*)).as("x"))
      .select(col("doc_id"), col("simhash"), col("x.band").as("band"), col("x.bk").as("bk"))
      .repartition(col("band"), col("bk")) // shared Exchange for the self-join
    val ham = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"),
        ham.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Paragraph segmentation (d27 front half): one row per paragraph,
    * (id, para_idx, para). `delimiter = Some(d)` splits on the literal
    * delimiter — the real-corpus path (e.g. "\n\n" for markdown-ish
    * text). `None` falls back to fixed non-overlapping `paraTokens`
    * token blocks via the native chunker (plans.ChunksExpr with
    * stride = size) — the segmentation of last resort for corpora with
    * no paragraph markers, still granular enough that shared runs
    * across near-dup documents land in identical blocks. Narrow
    * per-row explode; no shuffle. */
  def paragraphs(df: DataFrame, idCol: String, textCol: String,
                 delimiter: Option[String], paraTokens: Int = 40): DataFrame = {
    val parts = delimiter match {
      case Some(d) => split(col(textCol), java.util.regex.Pattern.quote(d))
      case None => TextAnalysis.chunksCol(col(textCol), paraTokens, paraTokens)
    }
    df.select(col(idCol), posexplode(parts).as(Seq("para_idx", "para")))
      .select(col(idCol), col("para_idx").cast("long").as("para_idx"), col("para"))
  }

  /** Within-document repetition removal (d38 — the Gopher/MassiveText
    * "repetition removal" cleaning rule, Rae et al. 2021 §A.1.2):
    * drop every repeated occurrence of an exact paragraph WITHIN one
    * document, keeping the first — the row-local twin of d27 (which
    * dedups paragraphs across the corpus). Templated pages, quoted
    * reply chains and navigation boilerplate repeat within a page;
    * cutting the repeats keeps the page.
    *
    * Segmentation follows `paragraphs`: a literal delimiter when the
    * corpus has one, else fixed non-overlapping `paraTokens` token
    * blocks (the native chunker). The rewrite is ONE narrow pass —
    * split, indexed-filter against the preceding prefix (first
    * occurrence kept by construction), re-join — zero shuffles at any
    * corpus size; the per-row cost is O(paras² · cmp), and paragraph
    * counts per doc are small. Output pins the rewrite by md5 plus
    * kept/dropped counts per doc (full corpus out, untouched docs
    * pass through with 0 dropped). */
  def dropRepeatedParagraphs(df: DataFrame, idCol: String, textCol: String,
                             delimiter: Option[String] = None,
                             paraTokens: Int = 40): DataFrame = {
    val sep = delimiter.getOrElse(" ")
    val parts = delimiter match {
      case Some(d) => split(col(textCol), java.util.regex.Pattern.quote(d))
      case None => TextAnalysis.chunksCol(col(textCol), paraTokens, paraTokens)
    }
    // keep part i iff no EARLIER part equals it: exists() over the
    // prefix slice — slice(arr, 1, i) is exactly the first i elements,
    // so element 0 always survives
    val kept = filter(col("__parts"), (x, i) =>
      !exists(slice(col("__parts"), lit(1), i), y => y === x))
    df.withColumn("__parts", parts)
      .withColumn("__kept", kept)
      .select(col(idCol),
        md5(array_join(col("__kept"), sep)).as("clean_md5"),
        size(col("__kept")).cast("long").as("n_paras_kept"),
        (size(col("__parts")) - size(col("__kept"))).cast("long")
          .as("n_paras_dropped"))
  }

  /** Paragraph-granular exact dedup (d27): per document, how many of
    * its paragraphs survive corpus-wide first-occurrence dedup. A
    * paragraph is KEPT iff its (doc, position) is the lexicographically
    * smallest occurrence of that exact paragraph in the corpus —
    * dropped paragraphs are what a paragraph-level cleaner strips
    * (boilerplate headers, quoted replies, shared license blocks)
    * while the document itself survives, the granularity doc-level
    * dedup (d05) and contiguous-overlap winnowing (d17) both miss.
    *
    * Scale shape: the owner table is ONE aggregation keyed on the
    * paragraph hash with map-side partial min — no window over hash
    * partitions, so a corpus-wide hot paragraph (a license block
    * repeated 10^9 times) costs its combiner a single struct, never a
    * single-task sort. The join back is hash-keyed and AQE-skew-
    * splittable; per-doc regrouping shuffles once on the doc id. */
  def paragraphDedupStats(df: DataFrame, idCol: String, textCol: String,
                          delimiter: Option[String] = None,
                          paraTokens: Int = 40): DataFrame = {
    val paras = paragraphs(df, idCol, textCol, delimiter, paraTokens)
      .withColumn("para_md5", md5(col("para")))
    val owners = paras
      .groupBy(col("para_md5"))
      .agg(min(struct(col(idCol), col("para_idx"))).as("__o"))
    paras.join(owners, "para_md5")
      .withColumn("kept",
        col(idCol) === col(s"__o.$idCol") && col("para_idx") === col("__o.para_idx"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"))
  }
}
