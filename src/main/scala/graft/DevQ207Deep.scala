package graft

/** Dev-only 100× deep point for q207 (round-11 verdict #4). q207 is
  * q177's registered scale path, so it cannot carry a `scaleLimited`
  * annotation itself — but under the DevScaling blowup its cost is
  * OUTPUT-sensitive, not corpus-sensitive: every copy k holds the same
  * event values under disjoint user ids, so factor F plants
  * C(F,2) × U_base genuinely perfect-correlation pairs and the exact
  * co-moment stage must score all of them. This probe measures the 100×
  * wall alongside the candidate-pair mass at base and at 100×, so the
  * SCALING.md attribution can show seconds-per-candidate staying flat
  * while the pair mass (the semantic output) explodes quadratically in
  * the clone count. Single timed rep at 100× — the pair mass makes
  * min-of-2 warm reps cost ~10 min for no extra information.
  *
  * Usage: tools/run_main.sh graft.DevQ207Deep [factor]
  */
object DevQ207Deep {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 100
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"/tmp/graft_scale$factor"
    val spark = Session.get()
    DevScaling.buildBlowup(spark, base, out, factor)
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val fn = SparkEntry.queries("q207_pair_corr_lsh")

    // Base: cold + 2 warm (the DevScaling protocol).
    drop(); t(fn(spark, base).count())
    val baseWarm = (1 to 2).map { _ => drop(); t(fn(spark, base).count()) }.min
    drop()
    val candBase = ForecastQueries.devStageCand(spark, base).count()

    // 100×: candidate mass first (its own cost is part of the story),
    // then ONE full rep.
    drop()
    val tCand = t(())
    val t0 = System.nanoTime()
    val candBig = ForecastQueries.devStageCand(spark, out).count()
    val candSecs = (System.nanoTime() - t0) / 1e9 + tCand
    drop()
    var rowsBig = 0L
    val fullBig = t { rowsBig = fn(spark, out).count() }
    println(f"== q207deep base_warm $baseWarm%.2f s cand_base $candBase")
    println(f"== q207deep x$factor cand $candBig in $candSecs%.2f s; full $fullBig%.2f s ($rowsBig rows)")
    println(f"== q207deep per-candidate us: base ${baseWarm / candBase * 1e6}%.1f  x$factor ${fullBig / candBig * 1e6}%.1f")
    spark.stop()
  }
}
