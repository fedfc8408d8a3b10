package graft

import org.apache.spark.sql.functions._

/** Dev-only: attribute q204's search-stage wall (baseline r18pre: cold
  * search wall 14.3 s, 249 s task CPU) to named plan segments with task
  * counters — windows build, exact top-k evaluate, forecast+score.
  */
object DevQ204Search {
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
    def t[A](name: String)(f: => A): A = {
      org.apache.spark.sql.graft.ListenerBridge.waitUntilListenerBusEmpty(spark)
      val before = counters.snapshot()
      val t0 = System.nanoTime(); val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.ListenerBridge.waitUntilListenerBusEmpty(spark)
      val dl = counters.snapshot().minus(before)
      println(f"[q204s] $name: wall=$wall%.2f task_run=${dl.runMs / 1e3}%.1f gc=${dl.gcMs / 1e3}%.1f sched=${dl.schedDelayMs / 1e3}%.1f tasks=${dl.tasks}")
      r
    }
    drop()
    // fit once (cached thereafter)
    val m = t("fit pipeline") {
      ExtraQueries.q204Pipeline(spark, d); ExtraQueries.PcaFit.lookup(Some(d)).get
    }
    drop()
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val wins = Flagship.embeddedWindows(Flagship.filledSeries(spark, d),
        24, 6, Some(m)).persist(lvl)
      var n = 0L
      t("wins build+count") { n = wins.count() }
      val top = graft.ohlcv.Forecast.evaluate(wins, "user_id", 24, 12, 24, 2,
        "l1", None, queryCountHint = Some(n / 24 + 1024))
        .persist(lvl)
      t("evaluate top-k")(top.count())
      t("forecastAndScore") {
        graft.ohlcv.Forecast.forecastAndScore(top, wins, "user_id", 24, 12,
          broadcastTop = true)
          .select(col("q_key"), col("q_start"))
          .write.format("noop").mode("overwrite").save()
      }
      drop()
    }
    spark.stop()
  }
}
