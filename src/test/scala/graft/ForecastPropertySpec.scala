package graft

import org.apache.spark.sql.functions._
import graft.ohlcv.HoltWinters

/** Algebraic identities behind the forecasting/detection pack. */
class ForecastPropertySpec extends SparkSpec {
  import spark.implicits._

  test("CUSUM closed form equals the sequential recurrence") {
    // S_t = max(0, S_{t-1} + z_t - k)  vs  C_t - min(0, min_{j<=t} C_j)
    // with C_t = sum(z_i - k), on integer quanta (the q182 form).
    val rnd = new scala.util.Random(5)
    val z = Array.fill(500)(rnd.nextInt(2000001).toLong - 1000000L)
    val k = 500000L
    var s = 0L
    val seq = z.map { zi => s = math.max(0L, s + zi - k); s }
    var c = 0L; var cmin = 0L
    val closed = z.map { zi =>
      c += zi - k
      cmin = math.min(cmin, c)
      c - math.min(0L, cmin)
    }
    assert(seq.toSeq == closed.toSeq)
  }

  test("Holt-Winters with gamma=0 collapses to plain Holt") {
    val ys = (1 to 60).map(i => 100.0 + 3 * math.sin(i / 5.0) + i * 0.1)
    val df = ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, y) }
      .toDF("k", "t", "y")
    val hw = HoltWinters.withHoltWintersSeasonal(df, "k", "t", "y",
        alpha = 0.5, beta = 0.25, gamma = 0.0, m = 24)
      .orderBy("t").select("level", "trend").collect()
    val h = HoltWinters.withHolt(df, "k", "t", "y", alpha = 0.5, beta = 0.25)
      .orderBy("t").select("level", "trend").collect()
    hw.zip(h).foreach { case (a, b) =>
      // With gamma=0 every seasonal stays 0, so s_{t-m} never perturbs
      // the level recurrence: identical to two-parameter Holt.
      assert(a.getDouble(0) == b.getDouble(0) && a.getDouble(1) == b.getDouble(1))
    }
  }

  test("variance ratio of an exact random walk's aggregated steps is consistent") {
    // VR(q) on q-period sums of iid steps ~ 1; here just pin the exact
    // integer identity: var over the q-sums computed from quanta equals
    // the direct co-moment formula (no fp order dependence).
    val rnd = new scala.util.Random(9)
    val x = Array.fill(400)(rnd.nextInt(200001).toLong - 100000L)
    val q2 = x.sliding(2).map(_.sum).toArray
    def varExact(v: Array[Long]): Double = {
      val n = v.length.toDouble
      val s = v.sum.toDouble
      val ss = v.map(a => a * a).sum.toDouble
      (n * ss - s * s) / (n * n)
    }
    val vr2 = varExact(q2) / (2.0 * varExact(x))
    assert(vr2 > 0.5 && vr2 < 1.5, s"white-noise VR(2) should be near 1, got $vr2")
  }

  test("native as-of join never matches NULL keys or NULL timestamps") {
    val left = Seq(
      (Some(1L), Some(10L), 1L, 1.0), // matches the non-null right row
      (Some(1L), None, 2L, 2.0), // null ts → no match
      (None, Some(10L), 3L, 3.0)) // null key → no match
      .toDF("user_id", "us", "event_id", "value")
    val right = Seq(
      (Some(1L), Some(5L), 10L, 9.0),
      (Some(1L), None, 11L, 8.0), // null ts right row is never a candidate
      (None, Some(1L), 12L, 7.0)) // null key right row is never a candidate
      .toDF("user_id", "us", "event_id", "value")
    val out = org.apache.spark.sql.graft.AsOfNative
      .asofBackward(left, right, "user_id", "us", "event_id",
        rightPayload = Seq("event_id", "value"))
      .orderBy("event_id").collect()
    assert(out(0).getAs[Long]("r_event_id") == 10L &&
      out(0).getAs[Double]("r_value") == 9.0)
    assert(out(1).isNullAt(out(1).fieldIndex("r_event_id")))
    assert(out(2).isNullAt(out(2).fieldIndex("r_event_id")))
  }

  test("native as-of join with an empty right side yields all-null payloads") {
    val left = Seq((1L, 10L, 1L, 5.0)).toDF("user_id", "us", "event_id", "value")
    val right = Seq.empty[(Long, Long, Long, Double)]
      .toDF("user_id", "us", "event_id", "value")
    val out = org.apache.spark.sql.graft.AsOfNative
      .asofBackward(left, right, "user_id", "us", "event_id",
        rightPayload = Seq("value"))
      .collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("r_value")))
  }
}
