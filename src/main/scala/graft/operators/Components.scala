package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the "cluster the near-dup
  * pairs, keep one document per cluster" step that follows MinHash /
  * Jaccard / SimHash candidate generation in corpus dedup (pairwise
  * drop rules like CorpusPipeline's are order-independent but can drop
  * both endpoints of a chain; cluster-then-keep-representative retains
  * exactly one per group).
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with itself; each round a vertex takes the minimum label
  * among itself and its neighbors; fixpoint = each component uniformly
  * carries its minimum vertex id. Rounds needed = graph diameter,
  * and dedup graphs are near-cliques (a duplicated document pairs with
  * most of its copies), so 2-4 rounds are typical. Each round is one
  * shuffle-join on the vertex id plus a partial-aggregated min — no
  * driver-side graph state, no vertex ever holds more than its label.
  *
  * Lineage is truncated with an eager `localCheckpoint` per round:
  * without it the iterated self-join doubles the plan each round and
  * the convergence check re-executes the whole history. On a real
  * cluster with executor loss concerns, swap for reliable
  * `checkpoint()` against a checkpoint dir — same contract.
  *
  * For adversarial long-chain graphs (diameter ~ vertices, e.g.
  * paragraph-overlap chains) the O(diameter) bound degrades; the
  * known remedy is alternating large-star/small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14), which
  * converges in O(log^2 n) rounds with the same per-round shuffle
  * shape. Not implemented: dedup-pair graphs don't produce such
  * chains, and maxIter makes the degradation loud (require fails)
  * rather than silent.
  */
object Components {

  /** (v, lbl) for every vertex appearing in `edges`, where lbl is the
    * minimum vertex id of v's component. Vertices with no edges are
    * absent (a singleton is its own representative — union them in if
    * needed). Deterministic for any partitioning of the input. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    // materialize the edge list once: every round (and every convergence
    // check) joins against it, and without the checkpoint the upstream
    // pair-generation pipeline would lazily re-execute per round
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .unionByName(edges
        .select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .localCheckpoint()
    // initial labels fused with the first propagation round: label0(v) =
    // min(v, min neighbor) is exactly what round 1 would produce from
    // the identity labeling, for the cost of the distinct() aggregation
    // alone — one fewer checkpoint+aggregate cycle per call
    var labels = sym
      .select(col("dst").as("v"), least(col("src"), col("dst")).as("lbl"))
      .groupBy(col("v")).agg(min(col("lbl")).as("lbl"))
      .localCheckpoint()
    // convergence via the label-sum invariant: labels only ever
    // decrease elementwise over a fixed vertex set, so an unchanged sum
    // IS the fixpoint — one cheap aggregate per round instead of a
    // change-detection join. Decimal sum: immune to overflow at any
    // vertex-id scale.
    // null-safe: sum over an EMPTY label set (no edges at all) is null —
    // fold it to zero so the first round compares equal and the loop
    // terminates with the correct empty result instead of an NPE
    def lblSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = lblSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = sym.as("e")
        .join(labels.as("l"), col("e.src") === col("l.v"))
        .select(col("e.dst").as("v"), col("l.lbl").as("lbl"))
        .unionByName(labels)
        .groupBy(col("v")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      val nextSum = lblSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "pathological chain graph; use large-star/small-star instead")
    labels
  }
}
