package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q207_pair_corr_lsh (round-9 verdict item
  * #5: top suite row at 4.30 s driver warm, +0.42 r/r — name the wall's
  * owner). Times the registered query bench-protocol (cold + 2 warm),
  * then each plan segment separately: users distinct-count, dense
  * returns build, signature aggregation, candidate signature self-join,
  * and the pair-correlation join + top-k.
  *
  * Usage: tools/run_main.sh graft.DevQ207Profile [sfDir]
  */
object DevQ207Profile {
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

    val fn = SparkEntry.queries("q207_pair_corr_lsh")
    for (rep <- 1 to 2) {
      drop()
      val cold = t(fn(spark, sfDir).count())
      val warm1 = t(fn(spark, sfDir).count())
      val warm2 = t(fn(spark, sfDir).count())
      println(f"== BENCHREP q207 rep $rep cold $cold%.2f warm1 $warm1%.2f warm2 $warm2%.2f")
    }

    for (rep <- 1 to 2) {
      drop()
      val tUsers = t(ForecastQueries.devStageUsers(spark, sfDir))
      val (tReturns, nDense) = {
        var n = 0L; val w = t { n = ForecastQueries.devStageDense(spark, sfDir).count() }; (w, n)
      }
      val (tSigs, nSigs) = {
        var n = 0L; val w = t { n = ForecastQueries.devStageSigs(spark, sfDir).count() }; (w, n)
      }
      val (tCand, nCand) = {
        var n = 0L; val w = t { n = ForecastQueries.devStageCand(spark, sfDir).count() }; (w, n)
      }
      val tFull = t(ForecastQueries.devStageFull(spark, sfDir).count())
      println(f"== STAGES q207 rep $rep users $tUsers%.2f dense $tReturns%.2f ($nDense rows) sigs $tSigs%.2f ($nSigs rows) cand $tCand%.2f ($nCand pairs) full $tFull%.2f")
    }
    spark.stop()
  }
}
