package graft

/** Dev-only recall-at-support harness (SCALING.md evidence for q207):
  * at the 10× corpus — where pairs with n ≥ 24 shared hours exist and
  * the exact top list is signal rather than small-sample accident —
  * measure the cohort screen's recall of the exact top-k, with P derived
  * from U via cohortPlanes. Also reports both sides' wall-clock, so the
  * recall number and the speedup it buys sit in one row.
  *
  * Usage: runMain graft.DevRecall [factor] [minSupport] [k]
  */
object DevRecall {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val minSupport = if (args.length > 1) args(1).toInt else 24
    val k = if (args.length > 2) args(2).toInt else 20
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"/tmp/graft_scale$factor"
    val spark = Session.get()
    DevScaling.buildBlowup(spark, base, out, factor)

    def pairsOf(df: org.apache.spark.sql.DataFrame): (Set[(Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val ps = df.select("u", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (ps, (System.nanoTime() - t0) / 1e9)
    }

    for (dir <- Seq(base, out)) {
      val users = Tables.events(spark, dir).select("user_id").distinct().count()
      val p = ForecastQueries.cohortPlanes(users)
      val (exact, tE) = pairsOf(ForecastQueries.pairCorrExact(spark, dir, minSupport, k))
      val (screen, tS) = pairsOf(ForecastQueries.pairCorrLsh(spark, dir, minSupport, p, k = k))
      val overlap = (exact & screen).size
      val recall = if (exact.isEmpty) Double.NaN else overlap.toDouble / exact.size
      println(f"== dir=$dir users=$users P=$p support=$minSupport k=$k " +
        f"exact=${exact.size} screen=${screen.size} overlap=$overlap " +
        f"recall=$recall%.2f exact_s=$tE%.1f screen_s=$tS%.1f")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
