package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic histogram-sketch quantile — the engine's typed UDAF
  * surface (SURVEY §2.10), built on `Aggregator` + `functions.udaf`.
  *
  * Unlike rank-based exact percentiles (one sort per group) or t-digest
  * (merge-order-dependent centroids), a fixed equi-width histogram has a
  * MERGE that is a vector add — associative, commutative, order-free —
  * so the same answer comes back on any partitioning, any cluster size,
  * and from any SQL engine that reproduces the bucketing arithmetic.
  * That makes it hash-checkable against DuckDB (q186) rather than only
  * tolerance-checkable, while scaling like a sketch: O(buckets) state
  * per group, single pass, map-side partial aggregation.
  *
  * Estimate contract (mirrored in SQL): with n values, 0-based target
  * rank k = floor(p·(n−1) + 0.5); the estimate is the midpoint of the
  * first bucket whose cumulative count exceeds k:
  * `lo + (idx + 0.5)·(hi−lo)/buckets`. Error ≤ half a bucket width.
  * Values outside [lo, hi) clamp to the edge buckets.
  */
class HistQuantile(lo: Double, hi: Double, buckets: Int, p: Double)
    extends Aggregator[java.lang.Double, Array[Long], Double] {

  require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
  require(hi > lo, s"need hi > lo (got [$lo, $hi))")

  private val width = (hi - lo) / buckets

  override def zero: Array[Long] = new Array[Long](buckets)

  // Boxed input so NULLs reach us (a primitive-Double Aggregator fails in
  // the deserializer on a nullable column); NULL and NaN are SKIPPED,
  // matching every builtin aggregate's treatment of NULL and keeping the
  // [lo, hi) clamp contract honest (NaN would otherwise floor to 0).
  override def reduce(b: Array[Long], boxed: java.lang.Double): Array[Long] = {
    if (boxed == null) return b
    val x = boxed.doubleValue()
    if (x.isNaN) return b
    val raw = math.floor((x - lo) / width).toInt
    val idx = if (raw < 0) 0 else if (raw >= buckets) buckets - 1 else raw
    b(idx) += 1
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Double = {
    var n = 0L
    var i = 0
    while (i < buckets) { n += b(i); i += 1 }
    if (n == 0L) return Double.NaN
    val k = math.floor(p * (n - 1) + 0.5).toLong
    var cum = 0L
    i = 0
    while (i < buckets) {
      cum += b(i)
      if (cum > k) return lo + (i + 0.5) * width
      i += 1
    }
    lo + (buckets - 0.5) * width
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.javaSerialization(classOf[Array[Long]])
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  def inputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object HistQuantile {
  /** Column form: `histQuantile(0, 500, 1024, 0.5)(col("value"))`. */
  def apply(lo: Double, hi: Double, buckets: Int, p: Double): Column => Column = {
    val agg = new HistQuantile(lo, hi, buckets, p)
    c => udaf(agg, agg.inputEncoder).apply(c)
  }
}
