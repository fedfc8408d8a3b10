package graft

import org.apache.spark.sql.functions._

/** Dev-only: per-segment task-CPU attribution of the flagship windows
  * pipeline (the dominant cold CPU of q60/q61/q101/q204/q262 — baseline
  * r18pre: ~320 s task CPU, 172 s GC for one wins build at sf0.1).
  */
object DevWinsProfile {
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
      println(f"[wins] $name: wall=$wall%.2f task_run=${dl.runMs / 1e3}%.1f gc=${dl.gcMs / 1e3}%.1f")
      drop()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val m = graft.ohlcv.Encode.randomProjectionMatrix(24, 6, 7L)
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      t("filledSeries")(noop(Flagship.filledSeries(spark, d)))
      t("sliding no-z (stats only)") {
        noop(graft.ohlcv.Windows.slidingZscored(
          Flagship.filledSeries(spark, d), "user_id", "idx", "close", 24)
          .filter(col("scale") > 1e-6)
          .select("user_id", "start_idx", "center", "scale"))
      }
      t("sliding with zvalues") {
        noop(graft.ohlcv.Windows.slidingZscored(
          Flagship.filledSeries(spark, d), "user_id", "idx", "close", 24)
          .filter(col("scale") > 1e-6)
          .select("user_id", "start_idx", "zvalues"))
      }
      t("embeddedWindows mean-pool") {
        noop(Flagship.embeddedWindows(Flagship.filledSeries(spark, d), 24, 6, None))
      }
      t("embeddedWindows projection") {
        noop(Flagship.embeddedWindows(Flagship.filledSeries(spark, d), 24, 6, Some(m)))
      }
    }
    spark.stop()
  }
}
