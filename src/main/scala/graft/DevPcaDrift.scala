package graft

import org.apache.spark.sql.functions._

/** Dev-only: fit q204's PCA matrix repeatedly in one session and report
  * whether the fitted literals are bit-identical across reps — the
  * cache-reuse precondition for q204's warm cost (round-9 investigation:
  * driver warm 36.4 s ≈ cold means the warm reps missed the persisted-plan
  * cache; ulp drift in the treeAggregate'd covariance is the suspect).
  */
object DevPcaDrift {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    import graft.ohlcv.{Encode, Windows}
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    def fitOnce(): Array[Array[Double]] = {
      val zwins = Windows.slidingZscored(
        Flagship.filledSeries(spark, sfDir)
          .filter(col("user_id") % lit(ExtraQueries.fitModulus(users)) === 0),
        "user_id", "idx", "close", ExtraQueries.FlagSeqLen)
        .filter(col("scale") > 1e-6)
        .select(col("zvalues").cast("array<double>").as("z"))
      Encode.pcaMatrix(zwins, "z", ExtraQueries.FlagSeqLen,
        ExtraQueries.FlagDim, sampleFraction = Some(0.35))
    }
    val first = fitOnce()
    (2 to reps).foreach { i =>
      val m = fitOnce()
      val diffs = for {
        r <- first.indices; c <- first(r).indices
        if first(r)(c) != m(r)(c)
      } yield math.abs(first(r)(c) - m(r)(c))
      println(f"== rep $i vs rep 1: ${diffs.size} differing entries, " +
        f"max abs diff ${if (diffs.isEmpty) 0.0 else diffs.max}%.3e")
    }
    spark.stop()
  }
}
