package graft

/** Dev-only staged q204 runner: prints the same per-stage wall-times
  * Bench records into bench_full.json (`q204_stages`), repeated N times,
  * so the driver-bench outlier (round-8 verdict #1) can be bracketed
  * against local stage costs on demand.
  *
  * Usage: runMain graft.DevQ204Stages [reps]
  */
object DevQ204Stages {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    (1 to reps).foreach { i =>
      val stages = scala.collection.mutable.LinkedHashMap[String, Double]()
      val df = ExtraQueries.q204Pipeline(spark, sfDir, stages)
      val t0 = System.nanoTime()
      df.count()
      stages("search") = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
      println(f"== rep $i: ${stages.map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")} total=${stages.values.sum}%.2f")
    }
    spark.stop()
  }
}
