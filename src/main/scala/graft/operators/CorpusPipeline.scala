package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end training-data curation: the composition a 100 TB corpus
  * actually runs, as one plan with a single persist boundary —
  *
  *   exact dedup (canonical-hash survivor)   [persisted]
  *     → fuzzy near-dup drop (df-capped shingle Jaccard)
  *     → language + quality gate
  *     → deterministic train/val/test split
  *
  * Every stage is an existing operator (Dedup / TextAnalysis), so the
  * whole pass inherits their scale properties: narrow per-row
  * transforms, one hash shuffle for exact dedup, a bounded
  * inverted-index join for near-dups (never all-pairs, hot shingles
  * capped), zero RNG state anywhere.
  *
  * The exact-dedup survivor set is consumed by TWO branches — the
  * shingle/near-dup pipeline and the anti-join's left side — so it is
  * persisted (MEMORY_AND_DISK: spills rather than OOMs at corpus
  * scale). Without the boundary the full-corpus dedup window, the most
  * expensive stage, executes once per consumer. Downstream of the
  * boundary the plan stays lazy, so Catalyst still prunes/pushes
  * across the remaining stage boundaries.
  *
  * Near-dup drop policy: a document is dropped iff it is Jaccard-similar
  * (≥ threshold over the capped shingle universe) to ANY smaller-id
  * document, surviving or not — the deterministic keep-smallest rule
  * (doc_id2-side of every pair), not transitive clustering and not
  * survivor chaining, so the result is order-independent and exactly
  * mirrorable in SQL.
  */
object CorpusPipeline {

  def curate(docs: DataFrame,
             jaccardThreshold: Double = 0.6,
             maxDocFreq: Int = 100,
             lang: String = "en",
             minQuality: Double = 0.3): DataFrame = {
    val exact = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nearDupIds = Dedup
      .jaccardPairs(Dedup.shingles(exact, "doc_id", "text", 3),
        jaccardThreshold, maxDocFreq)
      .select(col("doc_id2").as("doc_id"))
      .distinct()
    exact
      .join(nearDupIds, Seq("doc_id"), "left_anti")
      .filter(TextAnalysis.langIdHeuristic(col("text")) === lang)
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
      .withColumn("split",
        TextAnalysis.hashSplit(TextAnalysis.textHash(col("text"))))
  }
}
