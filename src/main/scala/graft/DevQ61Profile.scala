package graft

/** Dev-only attribution profiler for the q61_flagship_cosine driver
  * doubling (round-9 verdict item #2): reproduces the Bench protocol
  * exactly — clearCache, one cold rep, two warm reps, each rep a full
  * `queries(name)(spark, sf).count()` — for the whole flagship family,
  * then re-runs q61 standalone with per-stage walls (windows build+count,
  * evaluate top-k, forecast+score) in both cold and warm regimes, and
  * reports whether the warm rep's plans actually hit the cold rep's
  * persisted intermediates (cache-manager lookup per stage frame).
  *
  * Usage: tools/run_main.sh graft.DevQ61Profile [sfDir]
  */
object DevQ61Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }

    // --- Bench-identical protocol over the flagship family ---
    for (name <- Seq("q60_flagship_mae", "q61_flagship_cosine",
        "q62_mae_summary", "q101_flagship_lsh")) {
      val fn = SparkEntry.queries(name)
      val cold = t(fn(spark, sfDir).count())
      val warm1 = t(fn(spark, sfDir).count())
      val warm2 = t(fn(spark, sfDir).count())
      val nCached = spark.sparkContext.getPersistentRDDs.size
      drop()
      println(f"== BENCHREP $name cold $cold%.2f warm1 $warm1%.2f warm2 $warm2%.2f persisted_rdds $nCached")
    }

    // --- q61 stage walls at the REGISTERED constants (ExtraQueries
    // FlagSeqLen=24/Pred=12/Stride=24/Dim=6), cold then warm (persists
    // left hot between reps, exactly the bench warm regime) ---
    def hit(df: org.apache.spark.sql.DataFrame): Boolean =
      spark.sharedState.cacheManager
        .lookupCachedData(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
        .exists(_.cachedRepresentation.cacheBuilder.isCachedColumnBuffersLoaded)
    for (metricName <- Seq("l1", "cosine_dist"); rep <- 1 to 3) {
      if (rep == 1) drop()
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val wins = Flagship.embeddedWindows(
        Flagship.filledSeries(spark, sfDir), 24, 6, None).persist(lvl)
      val winsMat = hit(wins)
      var n = 0L
      val tWin = t { n = wins.count() }
      val top = graft.ohlcv.Forecast.evaluate(wins, "user_id", 24,
        12, 24, 2, metricName, queryCountHint = Some(n / 24 + 1024))
      val tTop = t(top.count())
      val scored = graft.ohlcv.Forecast.forecastAndScore(top, wins, "user_id",
        24, 12).persist(lvl)
      val scoredMat = hit(scored)
      val tScore = t(scored.count())
      println(f"== STAGES $metricName rep $rep winsMat $winsMat scoredMat $scoredMat windows $tWin%.2f topk $tTop%.2f score $tScore%.2f")
    }
    spark.stop()
  }
}
