package graft

/** Dev-only: bench-identical timing (cold + 2 warm reps, min) for an
  * arbitrary list of registered queries — the control-experiment tool for
  * attributing one query's anomaly (box vs plan).
  *
  * Usage: runMain graft.DevTimeQ q60_flagship_mae q204_flagship_pca
  */
object DevTimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    SparkEntry.queries.get("q01_pricing_summary").foreach(fn => fn(spark, sfDir).count())
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    args.foreach { name =>
      val cold = time(name)
      val w1 = time(name)
      val w2 = time(name)
      drop()
      println(f"== $name cold=$cold%.2f warm_min=${math.min(w1, w2)}%.2f (w1=$w1%.2f w2=$w2%.2f)")
    }
    spark.stop()
  }
}
