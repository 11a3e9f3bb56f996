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
}
