package graft.ohlcv

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Double*) =
    vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
      .toDF("symbol", "idx", "close")

  test("sma: null until min_periods rows, then trailing mean") {
    val out = series(1, 2, 3, 4, 5)
      .withColumn("sma3", Features.sma(col("close"), col("symbol"), col("idx"), 3))
      .orderBy("idx").select("sma3").collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 2.0)
    assert(out(4).getDouble(0) == 4.0)
  }

  test("withEma: pandas ewm(adjust=False) recurrence with min_periods nulls") {
    // pandas: s.ewm(span=3, adjust=False, min_periods=3).mean()
    //   alpha = 0.5; ema = [1, 1.5, 2.75, 3.875] -> first two null
    val out = Features.withEma(series(1, 2, 4, 5), "symbol", "idx", "close",
      Seq(Features.emaSpanSpec("ema3", 3)))
      .orderBy("idx").select("ema3").collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    assert(approx(out(2).getDouble(0), 2.75))
    assert(approx(out(3).getDouble(0), 3.875))
  }

  test("withEma: state resets between keys") {
    val df = Seq(("a", 0L, 10.0), ("a", 1L, 20.0), ("b", 0L, 100.0), ("b", 1L, 200.0))
      .toDF("symbol", "idx", "close")
    val out = Features.withEma(df, "symbol", "idx", "close",
      Seq(Features.emaSpanSpec("e", 1))) // alpha=1 -> ema == close
      .orderBy("symbol", "idx").select("e").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 20.0, 100.0, 200.0))
  }

  test("withRsi: all-up series saturates to 100, mixed series in (0,100)") {
    val up = Features.withRsi(series(1, 2, 3, 4, 5, 6), "symbol", "idx", "close", w = 3)
      .orderBy("idx").select("rsi").collect()
    assert(up.last.getDouble(0) == 100.0)
    val mixed = Features.withRsi(series(5, 6, 4, 7, 3, 8), "symbol", "idx", "close", w = 3)
      .orderBy("idx").select("rsi").collect()
    val last = mixed.last.getDouble(0)
    assert(last > 0 && last < 100)
  }

  test("withBollinger uses population std (ddof=0)") {
    val out = Features.withBollinger(series(1, 2, 3), "symbol", "idx", "close", w = 3, k = 2.0)
      .orderBy("idx").collect().last
    val mid = out.getAs[Double]("bb_mid")
    val up = out.getAs[Double]("bb_up")
    // pop std of (1,2,3) = sqrt(2/3); sample std would be 1.0
    assert(approx(mid, 2.0))
    assert(approx(up, 2.0 + 2.0 * math.sqrt(2.0 / 3.0)))
  }

  test("savgol reproduces a quartic polynomial exactly (interior AND edges)") {
    // A polyorder-4 Savitzky-Golay filter is exact on degree<=4 polynomials,
    // including scipy-style mode="interp" edges.
    def poly(t: Double): Double = 3.0 + 2.0 * t - 0.5 * t * t + 0.01 * t * t * t * t
    val df = (0 until 60).map(i => ("a", i.toLong, poly(i))).toDF("symbol", "idx", "close")
    val out = Features.withSavgol(df, "symbol", "idx", "close", "sg", window = 21, polyorder = 4)
      .orderBy("idx").select("idx", "sg").collect()
    out.foreach { r =>
      val t = r.getLong(0).toDouble
      assert(approx(r.getDouble(1), poly(t), 1e-6), s"at t=$t: ${r.getDouble(1)} vs ${poly(t)}")
    }
  }

  test("savgol center weights match the classical 21-point quartic kernel sign pattern") {
    val d = Features.SavgolDesign(21, 4)
    val w = d.centerWeights
    assert(w.length == 21)
    assert(approx(w.sum, 1.0, 1e-9))                  // DC preserved
    assert(w(10) > w(9) && w(9) > w(0))               // peak at center
    // symmetric
    (0 until 10).foreach(i => assert(approx(w(i), w(20 - i), 1e-9)))
  }
}
