package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the q101 flagship-LSH slope (SCALING.md):
  * times the three plan segments — window build (filledSeries +
  * embeddedWindows), LSH top-k evaluation, forecast+score — separately at
  * the base corpus and at a DevScaling blow-up, so the octave slope can
  * be attributed to a NAMED component instead of the whole query.
  *
  * Usage: runMain graft.DevFlagshipProfile [factor]
  * (expects /tmp/graft_scale<factor> built by DevScaling; builds it if
  * absent.)
  */
object DevFlagshipProfile {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 30
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"/tmp/graft_scale$factor"
    val spark = Session.get()
    DevScaling.buildBlowup(spark, base, out, factor)

    val planes = graft.ohlcv.Encode.randomProjectionMatrix(6, 3, 77L)

    def profile(dir: String): (Double, Double, Double, Long, Long) = {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      def t[A](f: => A): (Double, A) = {
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val wins = Flagship.embeddedWindows(
        Flagship.filledSeries(spark, dir), 24, 6, None).persist(lvl)
      val (tWin, nWins) = t(wins.count())
      val top = graft.ohlcv.Forecast.evaluate(wins, "user_id", 24, 12, 24, 2,
        "l1", Some(planes), queryCountHint = Some(nWins / 24 + 1024)).persist(lvl)
      val (tTop, nTop) = t(top.count())
      val (tScore, _) = t(
        graft.ohlcv.Forecast.forecastAndScore(top, wins, "user_id", 24, 12)
          .count())
      wins.unpersist(false); top.unpersist(false)
      spark.sharedState.cacheManager.clearCache()
      (tWin, tTop, tScore, nWins, nTop)
    }

    // Warm both paths once (JIT, file listing), then measure twice, min.
    profile(base)
    val baseRuns = (1 to 2).map(_ => profile(base))
    val bigRuns = (1 to 2).map(_ => profile(out))
    def best(rs: Seq[(Double, Double, Double, Long, Long)]) =
      rs.minBy(r => r._1 + r._2 + r._3)
    val b = best(baseRuns); val g = best(bigRuns)
    println(f"== stage        base_s   ${factor}x_s   ratio")
    println(f"== windows     ${b._1}%7.2f ${g._1}%7.2f ${g._1 / b._1}%7.2f   (rows ${b._4} -> ${g._4})")
    println(f"== lsh_topk    ${b._2}%7.2f ${g._2}%7.2f ${g._2 / b._2}%7.2f   (rows ${b._5} -> ${g._5})")
    println(f"== score       ${b._3}%7.2f ${g._3}%7.2f ${g._3 / b._3}%7.2f")
    println(s"""== PROFILE_JSON {"factor":$factor,"windows":{"base":${b._1},"big":${g._1}},"lsh_topk":{"base":${b._2},"big":${g._2}},"score":{"base":${b._3},"big":${g._3}}}""")
    spark.stop()
  }
}
