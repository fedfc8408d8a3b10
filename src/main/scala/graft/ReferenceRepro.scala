package graft

import org.apache.spark.sql.functions._

import graft.ohlcv.{Forecast, Ingest, TimeSeriesOps, Windows}

/** Reproduce the reference's evaluation harness (notebooks/test.ipynb
  * `evaluate(256, 192, …)`, BASELINE.md) on the reference's own BTC-USD
  * corpus with the engine's deterministic mean-pool encoder standing in
  * for the VAE (SURVEY.md §7.4 #8: weights are out of scope, so the
  * published MAE is a ballpark anchor, not an assertion target).
  *
  * Usage: runMain graft.ReferenceRepro [metric] [csvPath]
  */
object ReferenceRepro {
  def main(args: Array[String]): Unit = {
    val metric = if (args.nonEmpty) args(0) else "l1"
    val path = if (args.length > 1) args(1)
      else "/root/reference/data/bitstamp/BTC-USD_1h.csv"
    val spark = Session.get()

    val SeqLen = 256
    val Pred = 192
    val Stride = 64 // seq_len // 4, reference test.ipynb:803
    val K = 5
    val Dim = 64

    val bars = Ingest.readCsv(spark, path, "BTC/USD")
    val deduped = TimeSeriesOps.dedupKeepLast(bars, Seq("datetime"), col("ingest_order"))
      .withColumn("idx", TimeSeriesOps.timeIdx(col("datetime"), 3600))
    val series = TimeSeriesOps.gapFillFfill(
      deduped.select(col("symbol").as("user_id"), col("idx"), col("close")),
      "user_id", "idx", Seq("close"))

    val scored = Flagship.scoredQueriesSplit(series, metric, SeqLen, Pred,
      Stride, K, Dim, valRatio = 0.15)
    println(s"== scored queries: ${scored.count()}")
    val summary = Forecast.errorSummary(scored).head()
    println(f"== metric=$metric MAE mean=${summary.getDouble(0)}%.4f " +
      f"std=${summary.getDouble(1)}%.4f  (reference VAE baseline: L1 2.61/2.45, " +
      "L2 2.77/2.96, cosine 2.74/2.88)")
    spark.stop()
  }
}
