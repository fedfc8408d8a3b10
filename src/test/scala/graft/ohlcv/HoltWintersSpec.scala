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
