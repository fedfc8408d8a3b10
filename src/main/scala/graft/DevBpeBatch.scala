package graft

/** Dev-only: batched-BPE fill-rate / wall-time sweep over round counts —
  * the sizing evidence for q230's (R, B, W) knobs.
  *
  * Usage: runMain graft.DevBpeBatch [rounds ...]
  */
object DevBpeBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val roundCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 32, 48)
    val spark = Session.get()
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    roundCounts.foreach { r =>
      val t0 = System.nanoTime()
      val merges = PipelineQueries.bpeBatchedMerges(spark, sfDir, rounds = r)
      val secs = (System.nanoTime() - t0) / 1e9
      val byRound = merges.groupBy(_._1).view.mapValues(_.size).toMap
      val lastFills = (math.max(1, r - 4) to r).flatMap(i => byRound.get(i.toLong))
      println(f"== rounds=$r%3d merges=${merges.size}%4d wall=$secs%6.2f s " +
        f"(${secs / math.max(1, merges.size)}%.3f s/merge) last5fill=$lastFills")
    }
    spark.stop()
  }
}
