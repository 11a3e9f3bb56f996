package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed, mergeable
  * `Aggregator` — the bounded-state counterpart to Spark's HLL++
  * (`approx_count_distinct`, q21) with one property HLL lacks here:
  * the estimate is a pure deterministic function of the input hash set
  * (k smallest distinct 32-bit hashes; estimate (k-1)·2³²/v_k), so it
  * is bit-reproducible across engines and partitionings and has an
  * exact DuckDB oracle (q28), not just an accuracy-band check.
  *
  * Scale shape: state is a sorted array of ≤ k longs regardless of
  * input size; `reduce` is O(log k) search + O(k) insert only while a
  * new value beats the current k-th minimum (vanishingly rare once
  * warm), and partial aggregation merges map-side like any built-in
  * aggregate. This is the "novel sketch" slot of the builder brief's
  * custom-operator ladder: no built-in bounded top-k aggregate exists,
  * and a typed Aggregator (ObjectHashAggregate under the hood) is the
  * idiomatic Spark mechanism for it — the input hashing stays in
  * codegen'd Column expressions (md5 → conv), only the bounded min-k
  * state lives here.
  *
  * Inputs are 32-bit hash values in [0, 2³²) carried as Long.
  */
class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Double]
  with Serializable {
  // k >= 2 also guards finish()'s division: buf is sorted distinct
  // non-negative, so v_k = buf(k-1) can only be 0 when k == 1
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], v: Long): Array[Long] = insert(buf, v)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var r = a
    var i = 0
    while (i < b.length) { r = insert(r, b(i)); i += 1 }
    r
  }

  /** < k distinct hashes seen → the buffer IS the distinct set (exact
    * count); otherwise the KMV estimator (k-1)·2³²/v_k, rounded to 2
    * decimals in exact integer arithmetic (half-up on the rational —
    * same rationale as ExactNum.roundRatio4: rounding the double
    * diverges from the oracle on half-boundaries). The consumer
    * column is already the display value; q28 must NOT re-round. */
  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else {
      val vk = buf(k - 1)
      // floor((2·100·(k-1)·2^32 + vk) / (2·vk)) / 100: k ≤ ~1e6 keeps
      // the numerator far under 2^63
      ((200L * (k - 1) * 4294967296L + vk) / (2L * vk)).toDouble / 100.0
    }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Sorted-distinct insert keeping the k smallest. Returns the input
    * buffer unchanged (no allocation) when v is a duplicate or beyond
    * the k-th minimum. */
  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) return buf // already in the sketch
    val ins = -pos - 1
    if (ins >= k) return buf // larger than the current k-th minimum
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = v
    System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    out
  }
}
