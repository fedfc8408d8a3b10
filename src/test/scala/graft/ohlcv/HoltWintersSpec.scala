package graft.ohlcv

import graft.SparkSpec

class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  test("withHolt matches the hand-rolled recurrence and resets per key") {
    val ys = Seq(10.0, 12.0, 11.0, 15.0, 14.0)
    val df = (ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, y) } ++
      Seq((2L, 0L, 100.0), (2L, 1L, 110.0)))
      .toDF("k", "t", "y")
    val out = HoltWinters.withHolt(df, "k", "t", "y", alpha = 0.5, beta = 0.25)
      .orderBy("k", "t")
      .select("k", "level", "trend")
      .collect()

    // Reference loop, identical operation order.
    var l = ys.head; var b = 0.0
    val expect = Seq((l, b)) ++ ys.tail.map { y =>
      val lNew = 0.5 * y + 0.5 * (l + b)
      b = 0.25 * (lNew - l) + 0.75 * b
      l = lNew
      (l, b)
    }
    out.take(5).zip(expect).foreach { case (r, (el, eb)) =>
      assert(r.getDouble(1) == el && r.getDouble(2) == eb)
    }
    // Key 2 restarts: level = first value, trend = 0.
    assert(out(5).getDouble(1) == 100.0 && out(5).getDouble(2) == 0.0)
    assert(out(6).getDouble(1) == 0.5 * 110.0 + 0.5 * 100.0)
  }

  test("withHoltWintersSeasonal matches the hand-rolled ring recurrence") {
    val m = 3
    val ys = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 13.0, 16.0)
    val df = ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, y) }
      .toDF("k", "t", "y")
    val out = HoltWinters.withHoltWintersSeasonal(df, "k", "t", "y",
        alpha = 0.5, beta = 0.25, gamma = 0.25, m = m)
      .orderBy("t").select("level", "trend", "seasonal").collect()

    var l = 0.0; var b = 0.0; var n = 0
    val ring = Array.fill(m)(0.0)
    ys.zipWithIndex.foreach { case (y, i) =>
      val idx = n % m
      val sPrev = ring(idx)
      if (n == 0) { l = y; b = 0.0 }
      else {
        val lNew = 0.5 * (y - sPrev) + 0.5 * (l + b)
        b = 0.25 * (lNew - l) + 0.75 * b
        l = lNew
      }
      val sNew = 0.25 * (y - l) + 0.75 * sPrev
      ring(idx) = sNew
      n += 1
      assert(out(i).getDouble(0) == l, s"level at $i")
      assert(out(i).getDouble(1) == b, s"trend at $i")
      assert(out(i).getDouble(2) == sNew, s"seasonal at $i")
    }
    // After m steps the seasonal ring must actually recur (s_{t-m} != 0).
    assert(out(m + 1).getDouble(2) != 0.25 * (ys(m + 1) - out(m + 1).getDouble(0)))
  }

  test("withKalmanLevel matches the scalar filter and converges its gain") {
    val ys = Seq(10.0, 12.0, 11.0, 13.0, 12.5)
    val df = ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, y) }
      .toDF("k", "t", "y")
    val out = HoltWinters.withKalmanLevel(df, "k", "t", "y", 0.01, 1.0)
      .orderBy("t").select("x", "p").collect()
    var x = ys.head; var p = 1.0
    assert(out(0).getDouble(0) == x && out(0).getDouble(1) == p)
    ys.tail.zipWithIndex.foreach { case (y, i) =>
      val pp = p + 0.01
      val k = pp / (pp + 1.0)
      x = x + k * (y - x)
      p = (1 - k) * pp
      assert(out(i + 1).getDouble(0) == x && out(i + 1).getDouble(1) == p)
    }
    // Posterior variance is monotone-decreasing toward the steady state.
    val ps = out.map(_.getDouble(1))
    assert(ps.sliding(2).forall(w => w(1) <= w(0)))
  }

  test("null values carry state forward") {
    val df = Seq((1L, 0L, Some(10.0)), (1L, 1L, None), (1L, 2L, Some(20.0)))
      .toDF("k", "t", "y")
    val out = HoltWinters.withHolt(df, "k", "t", "y", 0.5, 0.25)
      .orderBy("t").select("level").collect()
    assert(out(0).getDouble(0) == 10.0)
    assert(out(1).getDouble(0) == 10.0) // unchanged through the null
    assert(out(2).getDouble(0) == 0.5 * 20.0 + 0.5 * 10.0)
  }
}
