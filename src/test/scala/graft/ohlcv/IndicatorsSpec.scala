package graft.ohlcv

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic invariants for the round-4 indicator families not covered by
  * the BTC-corpus goldens (those live in PandasParitySpec); every family
  * also has a DuckDB hash oracle (q85–q100).
  */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  // 80 bars of a rising but genuinely two-sided series (diffs change
  // sign, so RSI stays off its rails) with constant bar range.
  private lazy val bars = {
    val rows = (0 until 80).map { i =>
      val c = 100.0 + i + math.sin(i * 1.3) * 3.0
      ("s", i.toLong, c + 0.5, c - 0.5, c, 10.0 + (i % 7))
    }
    rows.toDF("sym", "t", "high", "low", "close", "volume")
  }

  private def col0(df: org.apache.spark.sql.DataFrame, c: String): Array[java.lang.Double] =
    df.orderBy("t").select(c).collect()
      .map(r => if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0)))

  test("mass index is exactly `slow` on constant-range bars") {
    // high − low ≡ 1.0 ⇒ both EMAs equal 1.0 ⇒ ratio 1 ⇒ Σ over 25 = 25.
    val out = col0(Indicators.withMassIndex(bars, "sym", "t"), "mass_index")
    val defined = out.filter(_ != null)
    assert(defined.nonEmpty)
    defined.foreach(v => assert(math.abs(v - 25.0) < 1e-9, s"mass $v"))
  }

  test("PVO is the percentage oscillator of the volume series") {
    // Same recurrence as withPpo applied to the volume column.
    val pvo = col0(Indicators.withPvo(bars, "sym", "t"), "pvo")
    val ppoOnVol = col0(
      Features.withPpo(bars.withColumnRenamed("volume", "v"), "sym", "t", "v"), "ppo")
    pvo.zip(ppoOnVol).foreach {
      case (a, b) if a == null || b == null => assert(a == null && b == null)
      case (a, b) => assert(math.abs(a - b) < 1e-12)
    }
  }

  test("ADI accumulates the CMF money-flow volume") {
    // One-bar check: ADI at t equals ADI at t−1 plus clv·volume of bar t.
    val adi = col0(Indicators.withAdi(bars, "sym", "t"), "adi")
    val rows = bars.orderBy("t").collect()
    (1 until rows.length).foreach { i =>
      val r = rows(i)
      val h = r.getAs[Double]("high"); val l = r.getAs[Double]("low")
      val c = r.getAs[Double]("close"); val v = r.getAs[Double]("volume")
      val clv = if (h > l) ((c - l) - (h - c)) / (h - l) else 0.0
      assert(math.abs(adi(i) - (adi(i - 1) + clv * v)) < 1e-9, s"bar $i")
    }
  }

  test("VPT: null first bar, then cumulative volume-weighted pct change") {
    val vpt = col0(Indicators.withVpt(bars, "sym", "t"), "vpt")
    assert(vpt(0) == null)
    val rows = bars.orderBy("t").collect()
    var acc = 0.0
    (1 until rows.length).foreach { i =>
      val c = rows(i).getAs[Double]("close"); val pc = rows(i - 1).getAs[Double]("close")
      acc += rows(i).getAs[Double]("volume") * (c - pc) / pc
      assert(math.abs(vpt(i) - acc) < 1e-9, s"bar $i")
    }
  }

  test("stochastic RSI stays in [0,1] and smooths with full windows") {
    val sr = Indicators.withStochRsi(bars.select("sym", "t", "close"), "sym", "t")
    val s = col0(sr, "stochrsi")
    val k = col0(sr, "stochrsi_k")
    assert(s.count(_ != null) > 10)
    s.filter(_ != null).foreach(v => assert(v >= -1e-12 && v <= 1 + 1e-12))
    k.filter(_ != null).foreach(v => assert(v >= -1e-12 && v <= 1 + 1e-12))
    // %K is the 3-bar mean of the raw stochastic where both are defined.
    val defined = s.indices.filter(i => i >= 2 && (i - 2 to i).forall(s(_) != null))
    assert(defined.nonEmpty)
    defined.foreach { i =>
      val m = (s(i - 2) + s(i - 1) + s(i)) / 3.0
      assert(k(i) != null && math.abs(k(i) - m) < 1e-12, s"row $i")
    }
  }

  test("KST matches a directly-computed toy evaluation") {
    val kst = col0(Indicators.withKst(bars.select("sym", "t", "close"), "sym", "t"), "kst")
    val closes = bars.orderBy("t").select("close").as[Double].collect()
    val rocs = Seq(10, 15, 20, 30); val smooths = Seq(10, 10, 10, 15)
    def rocma(i: Int, r: Int, n: Int): Option[Double] = {
      val vals = ((i - n + 1) to i).map { j =>
        if (j - r < 0) None else Some((closes(j) - closes(j - r)) / closes(j - r))
      }
      if (i - n + 1 < 0 || vals.exists(_.isEmpty)) None
      else Some(vals.flatten.sum / n)
    }
    Seq(45, 60, 79).foreach { i =>
      val parts = rocs.zip(smooths).map { case (r, n) => rocma(i, r, n) }
      val expected = 100.0 * (parts(0).get + 2 * parts(1).get +
        3 * parts(2).get + 4 * parts(3).get)
      assert(kst(i) != null && math.abs(kst(i) - expected) < 1e-9, s"bar $i")
    }
  }

  test("STC is bounded in [0,100] with every stage's head dropped") {
    // A pure linear trend gives a CONSTANT MACD, whose flat stochastic
    // windows the operator drops by design — use a wiggly series with
    // enough bars for the 50-EMA + two cycle windows + two smoothings.
    val n = 160
    val wiggly = (0 until n).map(i =>
      ("s", i.toLong, 100.0 + i + math.sin(i * 0.7) * 4.0))
      .toDF("sym", "t", "close")
    val out = col0(Indicators.withStc(wiggly, "sym", "t"), "stc")
    val defined = out.filter(_ != null)
    assert(defined.length >= 5, s"only ${defined.length} defined")
    defined.foreach(v => assert(v >= -1e-9 && v <= 100 + 1e-9, s"stc $v"))
  }
}
