package graft

/** Dev-only: stage timings for the flagship pipeline at sf0.1. */
object DevFlag {
  def main(args: Array[String]): Unit = {
    val spark = Session.get()
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val series = Flagship.filledSeries(spark, d)
    time("filledSeries")(println("  rows=" + series.count()))
    val wins = Flagship.embeddedWindows(series, 24, 6)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("embeddedWindows")(println("  rows=" + wins.count()))
    val top = ohlcv.Forecast.evaluate(wins, "user_id", 24, 12, 24, 2, "l1")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("evaluate topk")(println("  rows=" + top.count()))
    val scored = ohlcv.Forecast.forecastAndScore(top, wins, "user_id", 24, 12)
    time("forecastAndScore")(println("  rows=" + scored.count()))
    spark.stop()
  }
}
