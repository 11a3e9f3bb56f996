package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dense 1..N id assignment in sorted order — the AUTO_INCREMENT-on-
  * sorted-insert replication (SURVEY.md A2, reference `schema.sql:23`,
  * `etl1.py:437-442`).
  *
  * SIZE GUARD: every input row ends up in one task's hands — only apply
  * this after a cardinality-bounding step (a `distinct()` over a
  * low-cardinality column: ≤20 genres, ≤25 brands). Never use it over
  * an unbounded set; unbounded dense ids need a different contract
  * (e.g. per-partition offsets).
  *
  * Deliberately NOT `row_number().over(Window.orderBy(...))`: a
  * partition-less window logs WindowExec's "No Partition Defined"
  * WARN on every run, and partitioning the window by a constant column
  * doesn't help — FoldablePropagation + EliminateWindowPartitions fold
  * the constant and strip it, restoring the empty partition spec.
  * Instead the ids come from a global `sort_array(collect_list(...))`
  * + `posexplode`: identical output (sorted values get positions 1..N;
  * sort_array makes the nondeterministic collect_list order
  * irrelevant), and the plan is a partial+final aggregate — each
  * partition pre-collects its values, only the merged ≤N-element array
  * touches a single task — with no window operator to warn.
  */
object DenseId {

  /** NULL policy: NULL order values receive NO id and are absent from
    * the output — made explicit by the isNotNull filter below rather
    * than left to collect_list's silent NULL-dropping. This matches the
    * replicated semantics (an AUTO_INCREMENT key column is NOT NULL;
    * the reference inserts only real genre/brand values) but differs
    * from `row_number() over (order by ...)`, which would rank NULLs
    * first — callers needing ids for NULLs must map them to a sentinel
    * value beforehand. */
  def assign(df: DataFrame, orderCol: String, idCol: String): DataFrame =
    df.select(col(orderCol))
      .filter(col(orderCol).isNotNull)
      .agg(sort_array(collect_list(col(orderCol))).as("__vals"))
      .select(posexplode(col("__vals")).as(Seq("__pos", orderCol)))
      .select((col("__pos") + 1).as(idCol), col(orderCol))
}
