package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Token-budget shard assignment for training-data packing: documents
  * are laid out into fixed-token-budget shards in a deterministic
  * order, the step between corpus curation and writing tokenizer-ready
  * training shards.
  *
  * Contract: within each partition value (e.g. source), documents in
  * `orderCol` order accumulate `tokensCol`; a document's shard is
  * floor(exclusive-prefix-sum / budget) — the shard the document
  * STARTS in. Deterministic (no RNG, id-ordered), exactly mirrorable
  * in SQL, and stable: appending new documents (higher ids) never
  * moves an existing document's shard.
  *
  * Scale shape: the window partitions by `partitionCol`, so each
  * source's running sum proceeds in parallel and no single task sees
  * the whole corpus — a GLOBAL ordered cumsum would funnel 100 TB
  * through one task (the "No Partition Defined" window trap), which is
  * why the contract is per-partition shards, matching how corpora ship
  * (shards per source/domain). Integral `div` keeps the arithmetic
  * exact past 2^53 (same rationale as Multimodal.resizeMeta).
  */
object Packing {

  def assignShards(df: DataFrame, partitionCol: String, orderCol: String,
                   tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val w = Window.partitionBy(col(partitionCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard",
      call_function("div",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)),
        lit(budgetTokens)))
  }

  /** Fixed-length SEQUENCE packing manifest (d41) — the step LLM
    * pretraining actually runs: documents in a deterministic global
    * order concatenate into one token stream, the stream splits at
    * every `seqLen` boundary, and each training sequence is built from
    * the document slices that land in it (a long document spans
    * several sequences; a short one shares its sequence with
    * neighbors). Output: one row per (sequence, document) slice —
    * (seq_id, doc_id, doc_off, seq_off, n_tokens), 0-based offsets —
    * the manifest a tokenizer-side packer consumes to materialize
    * sequences without re-scanning text.
    *
    * The global exclusive prefix sum is the scale hazard here:
    * `assignShards` deliberately partitions per source because an
    * unpartitioned ordered window funnels the WHOLE corpus through one
    * task (the "No Partition Defined" trap). Sequence packing cannot
    * dodge it — the order is global by definition — so this operator
    * implements the classic TWO-PHASE distributed prefix sum,
    * declaratively:
    *   1. rows bucket by fixed VALUE ranges of `orderCol` (range
    *      bucketing needs only the (min, max) scalars — one cheap
    *      agg, broadcast back; bucket order is aligned with key order
    *      by construction, no global pass);
    *   2. within-bucket exclusive cumsum — a PARTITIONED window, all
    *      buckets in parallel;
    *   3. per-bucket totals cumsum — the only unpartitioned window,
    *      over ≤ `buckets` ROWS (bounded by the knob, never by the
    *      corpus), broadcast-joined back;
    *   4. global offset = bucket base + within-bucket prefix; each
    *      doc explodes to its covered sequences via one `sequence`
    *      generator (≤ ceil(len/seqLen)+1 rows per doc).
    *
    * Deterministic, exact integer arithmetic end to end; the oracle
    * mirrors the SEMANTICS with a plain global-window cumsum (fine at
    * oracle scale) — the two-phase decomposition is bit-equal to the
    * global sum because token counts are integers and addition is
    * associative. Ties in `orderCol` would make the prefix sum
    * order-ambiguous, so uniqueness is a contract (`doc_id` for the
    * registered query); the key must be numeric, and the bucket
    * arithmetic needs (max − min + 1) · buckets < 2⁶³ — at the
    * default 1024 buckets that allows a key span of ~9·10¹⁵, far
    * past any real doc-id universe. The span contract is enforced
    * with a loud raise_error on the bounds row (round-18 ADVICE),
    * never a silent wrap. */
  def packSequences(df: DataFrame, orderCol: String, tokensCol: String,
                    seqLen: Long, buckets: Int = 1024): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val bounds = df.agg(
      min(col(orderCol)).as("__lo"), max(col(orderCol)).as("__hi"))
    // value-range bucket: (key - lo) * buckets / (hi - lo + 1) — integer,
    // order-aligned, and every bucket id is in [0, buckets)
    //
    // The (max − min + 1) · buckets < 2⁶³ contract is ENFORCED, not just
    // documented (round-18 ADVICE): a key span past the bound would
    // silently overflow (key − lo) · buckets into negative bucket ids
    // and emit a corrupt packing manifest. The check reads only the
    // broadcast bounds row, so it is constant-folded per partition:
    // a wrapped (hi − lo) is NEGATIVE (true diff ≥ 0 always, so a
    // negative value proves 2⁶³ overflow of the diff itself), and a
    // legal diff must stay ≤ ⌊2⁶³−1 / buckets⌋ − 1 for (diff+1)·buckets
    // to fit a long (conservative by at most one key at the boundary).
    val maxDiff = Long.MaxValue / buckets - 1
    val spanDiff = (col("__hi") - col("__lo")).cast("long")
    val bucketed = df
      .select(col(orderCol), col(tokensCol).cast("long").as("__n"))
      .crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(spanDiff < 0L || spanDiff > maxDiff,
          raise_error(concat(
            lit(s"packSequences: key span * $buckets buckets overflows " +
              "long bucket arithmetic (span "),
            (col("__hi") - col("__lo")).cast("string"),
            lit(s"+1 keys, max ${maxDiff + 1}) — raise `buckets` " +
              "granularity down or renumber the key domain"))))
        .otherwise(call_function("div",
          (col(orderCol) - col("__lo")).cast("long") * buckets,
          (col("__hi") - col("__lo")).cast("long") + 1L)))
      .drop("__lo", "__hi")
    val inBucket = Window.partitionBy(col("__b")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = bucketed.withColumn("__local",
      coalesce(sum(col("__n")).over(inBucket), lit(0L)))
    // per-bucket totals, then the bounded unpartitioned cumsum
    val baseW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = bucketed.groupBy(col("__b"))
      .agg(sum(col("__n")).as("__tot"))
      .withColumn("__base", coalesce(sum(col("__tot")).over(baseW), lit(0L)))
      .select(col("__b"), col("__base"))
    val offd = withLocal.join(broadcast(bases), Seq("__b"))
      .withColumn("__o", col("__base") + col("__local"))
    // sequences covered: floor(o/S) .. floor((o+n-1)/S); slice bounds
    // per sequence by pure integer clamps
    val S = lit(seqLen)
    offd
      .filter(col("__n") > 0)
      .withColumn("seq_id",
        explode(sequence(
          call_function("div", col("__o"), S),
          call_function("div", col("__o") + col("__n") - 1L, S))))
      .withColumn("__sstart", col("seq_id") * S)
      .select(
        col("seq_id"),
        col(orderCol),
        greatest(col("__sstart") - col("__o"), lit(0L)).as("doc_off"),
        greatest(col("__o") - col("__sstart"), lit(0L)).as("seq_off"),
        (least(col("__sstart") + S, col("__o") + col("__n"))
          - greatest(col("__sstart"), col("__o"))).as("n_tokens"))
  }
}
