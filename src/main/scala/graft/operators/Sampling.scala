package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing: keep each row with
  * a per-source probability, decided by a hash coin on the row's id —
  * not by `rand()`. The properties that matter when building a corpus:
  *
  *  - reproducible: the same document survives or not regardless of
  *    run, partitioning, cluster size, or execution order (no RNG
  *    state, no seed plumbing);
  *  - stable under corpus growth: adding documents never flips the
  *    keep/drop decision of an existing one (each coin depends only on
  *    that row's id), so repeated pipeline runs converge;
  *  - exact to an external oracle: the coin is an md5 prefix, the
  *    comparison integer arithmetic.
  *
  * Coin: first 24 bits of md5(id) as a uniform draw in [0, 2^24); keep
  * iff draw < weight·2^24. Per-source weights express mixing ratios
  * ("2 parts web, 1 part wiki"): the expected kept volume per source is
  * weight × source volume, which is how corpus mixing recipes are
  * specified (sampling rates, not output quotas — quota-exact variants
  * need a global sort and are not partition-stable).
  */
object Sampling {

  /** 24-bit uniform hash coin on the id column. */
  def hashCoin(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long")

  /** Per-source keep probability as a Column (unlisted sources get
    * `defaultWeight`). Weights are sorted for a deterministic
    * expression tree. */
  def sourceWeight(source: Column, weights: Map[String, Double],
                   defaultWeight: Double): Column =
    weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight): Column) {
      case (e, (s, p)) => when(source === lit(s), lit(p)).otherwise(e)
    }

  /** Filter `df` down to the mixed sample. Pure narrow per-row filter:
    * no shuffle, no state — runs at scan speed over 100 TB and pushes
    * nothing onto the driver. */
  def sampleBySource(df: DataFrame, sourceCol: String, idCol: String,
                     weights: Map[String, Double],
                     defaultWeight: Double = 1.0): DataFrame =
    df.filter(hashCoin(col(idCol)).cast("double") <
      sourceWeight(col(sourceCol), weights, defaultWeight) * 16777216.0)

  /** Temperature-scaled mixing weights (the multinomial source
    * balancing of multilingual/multi-source LM training, e.g. the
    * alpha-scaled sampling of GPT-3/XLM-R data recipes): source weight
    * ∝ volume^alpha, flattening the head and lifting the tail as
    * alpha→0. Fixed alpha = 0.5 here, so the scaling is `sqrt` — a
    * correctly-rounded IEEE op, identical in every engine.
    *
    * Determinism contract: each per-source sqrt is scaled to an
    * integer micro-weight BEFORE the normalizing sum, so the
    * denominator is associative integer math; the derived probability
    * and the integer-floor token budget are then exact functions of
    * exact inputs. One tiny aggregate (≤ #sources rows) — the volume
    * counts are the only corpus-wide pass.
    *
    * Returns (source, n_tokens, w_micro, p_r4, budget_tokens):
    * budget_tokens = floor(w_micro · epochBudget / Σ w_micro), computed
    * in DECIMAL(38,0) (exact floor via subtract-remainder-then-divide,
    * same pattern as ExactNum.hiWord) — w_micro · epochBudget can pass
    * 2^63 for large corpora × large budgets, so the multiply must not
    * run in long arithmetic. */
  def temperatureMixWeights(df: DataFrame, sourceCol: String,
                            tokensPerRow: Column,
                            epochBudget: Long): DataFrame = {
    require(epochBudget > 0, s"epochBudget must be positive: $epochBudget")
    val perSource = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(tokensPerRow).as("n_tokens"))
      .withColumn("w_micro",
        round(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
    val total = perSource.agg(sum(col("w_micro")).as("w_total"))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_tokens"), col("w_micro"),
        graft.functions.ExactNum.roundRatio4(col("w_micro"), col("w_total"))
          .as("p_r4"), {
          val p = col("w_micro").cast("decimal(38,0)") * lit(epochBudget)
          val q = col("w_total").cast("decimal(38,0)")
          ((p - p % q) / q).cast("long").as("budget_tokens")
        })
  }
}
