package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-unigram language-model scoring — the CCNet-style quality
  * signal (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data", 2020, uses a KenLM; the unigram
  * variant keeps the same cross-entropy contract with no external
  * model): score each document by its mean negative log-probability
  * under the corpus's own unigram distribution. Natural prose made of
  * common tokens scores low; rare-token gibberish, encoding junk, and
  * boilerplate-free ID strings score high — a standard
  * filter-by-threshold or sort-into-quality-buckets input.
  *
  * Scale shape: two passes. Pass 1 builds the vocabulary —
  * explode(tokens) → partial-aggregated count per token — one shuffle
  * whose output is the DISTINCT vocabulary, vastly smaller than the
  * corpus (Heaps' law), so pass 2 broadcasts it back onto the exploded
  * tokens (no second shuffle of the corpus; the per-doc regroup is the
  * only other shuffle). The global token total rides along as a
  * broadcast single-row cross join, never a driver collect.
  *
  * Determinism contract: per-token cost is pre-scaled to integer
  * micro-nats (round(ln(total/cnt) * 1e6) as long) BEFORE the per-doc
  * sum, so aggregation is associative integer math — partition- and
  * engine-order-proof; only the final display average divides doubles,
  * from exactly equal integer inputs.
  *
  * Known residual assumption: `ln` itself. Math.log is specified to
  * 1 ulp, not correctly rounded, so an external oracle whose libm
  * disagrees on a token whose cost lands within 1 ulp of a half
  * micro-nat could round one unit differently (this environment's
  * JVM/DuckDB pair agrees — pinned by the gate at three scales). If a
  * platform ever diverges, materialize `unigramCosts` once and feed
  * the SAME cost table to both engines; everything downstream is
  * already exact integer math. Contrast sqrt (used by the mixing
  * weights), which IEEE 754 requires to be correctly rounded.
  */
object LmScore {

  /** Vocabulary with integer micro-nat costs: (tok, cnt, nlp_micro)
    * where nlp_micro = round(1e6 * ln(total / cnt)). */
  def unigramCosts(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("tok"), col("cnt"),
        round(log(col("total").cast("double") / col("cnt").cast("double")) * 1e6)
          .cast("long").as("nlp_micro"))
  }

  /** Per-document LM score: (doc_id, n_tokens, sum_nlp_micro,
    * avg_neglogp_r4). sum_nlp_micro is exact; the average is the one
    * derived double, rounded to 4 decimals. */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    toks.join(broadcast(unigramCosts(docs, textCol)), "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("nlp_micro")).as("sum_nlp_micro"))
      .select(col("doc_id"), col("n_tokens"), col("sum_nlp_micro"),
        // exact integer half-up rounding (ExactNum.roundRatio4): the
        // average is a rational of the exact sums, so round(double, 4)
        // would be exposed to cross-engine half-boundary divergence
        graft.functions.ExactNum.roundRatio4(
          col("sum_nlp_micro"), col("n_tokens") * lit(1000000L))
          .as("avg_neglogp_r4"))
  }
}
