package graft

/** Dev-only A/B of q207's persist trim at blown-up scale: times the
  * registered composition with and without the intra-query persists on
  * the same dir, interleaved, cache dropped between reps. Motivated by
  * the round-10 octave sweep reading 42.7 s @30× where round 8 measured
  * 17.35 s for the pre-trim plan — attribute before keeping the trim.
  *
  * Usage: tools/run_main.sh graft.DevQ207Scale [dir] [reps]
  */
object DevQ207Scale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale30"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Session.get()
    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    val p = ForecastQueries.cohortPlanes(ForecastQueries.devStageUsers(spark, dir))
    // JIT + page-cache warmup rep (discarded).
    drop()
    t(ForecastQueries.pairCorrLsh(spark, dir, 8, p).count())
    for (rep <- 1 to reps) {
      drop()
      val withP = t(ForecastQueries.pairCorrLsh(spark, dir, 8, p,
        persistFrames = true).count())
      drop()
      val noP = t(ForecastQueries.pairCorrLsh(spark, dir, 8, p,
        persistFrames = false).count())
      println(f"== AB q207 rep $rep persist $withP%.2f nopersist $noP%.2f")
    }
    spark.stop()
  }
}
