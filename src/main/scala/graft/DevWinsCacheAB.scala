package graft

import org.apache.spark.sql.functions._

/** Dev-only A/B/C: the flagship scored-queries flow with
  *  A) the current full-width wins persist (values+zvalues? — as shipped),
  *  B) no persist at all (each consumer recomputes the window pipeline),
  *  C) a narrow persist (center/scale/embedding + pre-sliced follow).
  * End-to-end action timed cold-style (caches dropped between runs).
  */
object DevWinsCacheAB {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    val counters = new TaskCounters
    spark.sparkContext.addSparkListener(counters)
    SparkEntry.queries("q01_pricing_summary")(spark, d).count()
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    def t[A](name: String)(f: => A): Unit = {
      org.apache.spark.sql.graft.ListenerBridge.waitUntilListenerBusEmpty(spark)
      val before = counters.snapshot()
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.ListenerBridge.waitUntilListenerBusEmpty(spark)
      val dl = counters.snapshot().minus(before)
      println(f"[ab] $name: wall=$wall%.2f task_run=${dl.runMs / 1e3}%.1f gc=${dl.gcMs / 1e3}%.1f")
      drop()
    }
    val m = graft.ohlcv.Encode.randomProjectionMatrix(24, 6, 7L)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def variantA(): Long = {
      val scored = Flagship.scoredQueries(spark, d, metric = "l1", seqLen = 24,
        predWindow = 12, stride = 24, k = 2, embedDim = 6, projection = Some(m))
      scored.count()
    }

    def variantB(): Long = {
      val wins = Flagship.embeddedWindows(Flagship.filledSeries(spark, d), 24, 6, Some(m))
      val winCount = wins.count()
      val qh = winCount / 24 + 1024
      val top = graft.ohlcv.Forecast.evaluate(wins, "user_id", 24, 12, 24, 2, "l1",
        None, queryCountHint = Some(qh))
      graft.ohlcv.Forecast.forecastAndScore(top, wins, "user_id", 24, 12,
        broadcastTop = qh <= (1L << 18)).count()
    }

    def variantC(): Long = {
      val wide = Flagship.embeddedWindows(Flagship.filledSeries(spark, d), 24, 6, Some(m))
      val narrow = wide.select(col("user_id"), col("start_idx"),
        col("center"), col("scale"), col("embedding"),
        slice(col("values"), 1, 12).as("follow_values"))
        .persist(lvl)
      val winCount = narrow.count()
      val qh = winCount / 24 + 1024
      val top = graft.ohlcv.Forecast.evaluate(narrow, "user_id", 24, 12, 24, 2, "l1",
        None, queryCountHint = Some(qh))
      // inline forecastAndScore over pre-sliced follow values
      def followOf(w: org.apache.spark.sql.DataFrame) = w.select(
        col("user_id").as("f_key"), col("start_idx").as("f_start"),
        col("follow_values"))
      val hint: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        if (qh <= (1L << 18)) broadcast else identity
      val matches = hint(top.filter(col("rank") <= 2))
        .join(followOf(narrow), col("user_id") === col("f_key") &&
          (col("start_idx") + 24) === col("f_start"), "inner")
        .withColumn("forecast", graft.ohlcv.Forecast.rescale(
          col("follow_values"), col("center"), col("scale")))
      val perQuery = matches.groupBy("q_key", "q_start", "q_center", "q_scale")
        .agg(first(when(col("rank") === 1, col("forecast")), ignoreNulls = true).as("f1"),
          first(when(col("rank") === 2, col("forecast")), ignoreNulls = true).as("f2"))
        .withColumn("forecast", when(col("f2").isNull, col("f1"))
          .otherwise(graft.ohlcv.Forecast.ensemble2(col("f1"), col("f2"))))
      val withTarget = hint(perQuery)
        .join(followOf(narrow), col("q_key") === col("f_key") &&
          (col("q_start") + 24) === col("f_start"), "inner")
        .withColumn("target", graft.ohlcv.Forecast.rescale(
          col("follow_values"), col("q_center"), col("q_scale")))
      withTarget.select(col("q_key"), col("q_start"),
        graft.ohlcv.Forecast.mae(col("forecast"), col("target")).as("mae_err"))
        .count()
    }

    for (rep <- 1 to 3) {
      println(s"=== rep $rep")
      t("A persisted-wide (shipped)")(println("  rows=" + variantA()))
      t("B uncached")(println("  rows=" + variantB()))
      t("C persisted-narrow")(println("  rows=" + variantC()))
    }
    spark.stop()
  }
}
