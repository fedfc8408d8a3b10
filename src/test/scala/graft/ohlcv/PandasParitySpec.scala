package graft.ohlcv

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity against pandas-computed goldens over the ACTUAL reference corpus
  * (first 300 rows of `/root/reference/data/bitstamp/BTC-USD_1h.csv`,
  * read-only): the operators must reproduce the exact pandas calls the
  * reference makes — SURVEY.md §5 item 2.
  */
class PandasParitySpec extends SparkSpec {
  import spark.implicits._

  private val G = PandasGoldens.values

  private lazy val bars = Ingest.readCsv(spark,
      "/root/reference/data/bitstamp/BTC-USD_1h.csv", "BTC/USD")
    .orderBy("datetime")
    .limit(G("n_rows").toInt)
    .cache()

  private lazy val closes: Array[java.lang.Double] = {
    val rows = bars.orderBy("datetime").select("close").collect()
    rows.map(r => if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0)))
  }

  private def assertGold(actual: java.lang.Double, key: String, tol: Double = 1e-9): Unit = {
    val expected = G(key)
    if (expected.isNaN) assert(actual == null, s"$key: expected null, got $actual")
    else {
      assert(actual != null, s"$key: expected $expected, got null")
      assert(approx(actual, expected, tol), s"$key: got $actual want $expected")
    }
  }

  test("corpus slice loads with the expected head") {
    assert(bars.count() == 300)
    assert(bars.agg(min("datetime")).head.getTimestamp(0).toString
      .startsWith(PandasGoldens.firstTs))
    val wd = TimeSeriesOps.withCalendar(bars, "datetime")
      .orderBy("datetime").select("day_of_week").head.getInt(0)
    assert(wd == G("weekday_0").toInt)
  }

  test("resampleOhlcv(4h) matches pandas resample(closed=right, label=right)") {
    val agg = TimeSeriesOps.resampleOhlcv(bars, "symbol", "datetime", 14400,
      emitEmpty = false)
      .withColumn("bucket_s", unix_timestamp(col("datetime")))
      .orderBy("bucket_s").collect()
    Seq(0, 1, 10, 50).foreach { i =>
      val r = agg(i)
      assert(r.getAs[Long]("bucket_s") == G(s"resample4h_${i}_bucket_s").toLong,
        s"bucket $i label")
      Seq("open", "high", "low", "close").foreach { c =>
        assertGold(r.getAs[Double](c), s"resample4h_${i}_$c")
      }
      assertGold(r.getAs[Double]("volume"), s"resample4h_${i}_volume", 1e-9)
    }
  }

  test("withEma(span=50) matches pandas ewm(adjust=False, min_periods=50)") {
    val out = Features.withEma(bars.select("symbol", "datetime", "close"),
      "symbol", "datetime", "close", Seq(Features.emaSpanSpec("e", 50)))
      .orderBy("datetime").select("e").collect()
      .map(r => if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0)))
    Seq(48, 49, 100, 299).foreach(i => assertGold(out(i), s"ema50_$i"))
  }

  test("sma(50) matches pandas rolling(50).mean()") {
    val out = bars
      .withColumn("s", Features.sma(col("close"), col("symbol"), col("datetime"), 50))
      .orderBy("datetime").select("s").collect()
      .map(r => if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0)))
    Seq(48, 49, 150).foreach(i => assertGold(out(i), s"sma50_$i"))
  }

  test("rollingStdPop(20) matches pandas rolling(20).std(ddof=0)") {
    val out = bars
      .withColumn("s", Features.rollingStdPop(col("close"), col("symbol"), col("datetime"), 20))
      .orderBy("datetime").select("s").collect()
      .map(r => if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0)))
    Seq(19, 150).foreach(i => assertGold(out(i), s"stdpop20_$i", 1e-8))
  }

  test("withRsi(14) matches the ta-library pandas formula") {
    val out = Features.withRsi(bars.select("symbol", "datetime", "close"),
      "symbol", "datetime", "close", w = 14)
      .orderBy("datetime").select("rsi").collect()
      .map(r => if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0)))
    Seq(14, 150, 299).foreach(i => assertGold(out(i), s"rsi14_$i", 1e-8))
  }

  test("withMacd matches the ta-library pandas formulas (line + signal)") {
    val out = Features.withMacd(bars.select("symbol", "datetime", "close"),
      "symbol", "datetime", "close")
      .orderBy("datetime").select("macd", "macd_signal").collect()
    Seq(33, 150, 299).foreach { i =>
      val m = if (out(i).isNullAt(0)) null else java.lang.Double.valueOf(out(i).getDouble(0))
      val s2 = if (out(i).isNullAt(1)) null else java.lang.Double.valueOf(out(i).getDouble(1))
      assertGold(m, s"macd_$i", 1e-8)
      assertGold(s2, s"macdsig_$i", 1e-8)
    }
  }
}
