package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("estimate is within half a bucket of the exact quantile") {
    val rnd = new scala.util.Random(3)
    val xs = (1 to 10000).map(_ => rnd.nextDouble() * 400)
    val df = xs.map(Tuple1(_)).toDF("v")
    val got = df.agg(HistQuantile(0.0, 512.0, 1024, 0.5)(col("v"))).head.getDouble(0)
    val exact = xs.sorted.apply((0.5 * (xs.size - 1) + 0.5).toInt)
    assert(math.abs(got - exact) <= 0.5, s"got $got exact $exact")
  }

  test("answer is invariant to partitioning (merge is a vector add)") {
    val xs = (1 to 5000).map(i => (i % 977).toDouble)
    val one = xs.map(Tuple1(_)).toDF("v").repartition(1)
      .agg(HistQuantile(0.0, 512.0, 1024, 0.9)(col("v"))).head.getDouble(0)
    val many = xs.map(Tuple1(_)).toDF("v").repartition(16)
      .agg(HistQuantile(0.0, 512.0, 1024, 0.9)(col("v"))).head.getDouble(0)
    assert(one == many)
  }

  test("NULL and NaN inputs are skipped like builtin aggregates") {
    val df = Seq(Some(10.0), None, Some(Double.NaN), Some(20.0), Some(30.0))
      .map(Tuple1(_)).toDF("v")
    val got = df.agg(HistQuantile(0.0, 512.0, 1024, 0.5)(col("v"))).head.getDouble(0)
    // Only {10, 20, 30} count: median bucket holds 20.0 → midpoint 20.25.
    assert(got == 20.25, s"got $got")
  }

  test("out-of-range values clamp to edge buckets") {
    val df = Seq(-100.0, 1.0, 10000.0).map(Tuple1(_)).toDF("v")
    val p0 = df.agg(HistQuantile(0.0, 512.0, 1024, 0.0)(col("v"))).head.getDouble(0)
    val p1 = df.agg(HistQuantile(0.0, 512.0, 1024, 1.0)(col("v"))).head.getDouble(0)
    assert(p0 == 0.25) // first bucket midpoint
    assert(p1 == 511.75) // last bucket midpoint
  }
}
