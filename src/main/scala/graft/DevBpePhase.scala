package graft

/** Dev-only: per-phase wall breakdown of the q260 phrase-BPE loop —
  * seed build vs pool job (pair agg + top-W collect) vs driver
  * acceptance vs state apply — to attribute the trainer's round floor
  * to a NAMED stage instead of guessing. Drives the PRODUCTION trainer
  * itself through its stage hook (round-12 ADVICE #4: a probe that
  * duplicates the loop silently de-syncs from the thing it measures the
  * moment the production loop is edited). Optional arg = dominance
  * levels (the L-levels experiment knob; production default 8).
  */
object DevBpePhase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val levels = args.headOption.map(_.toInt).getOrElse(8)
    val spark = Session.get()
    val stages = scala.collection.mutable.LinkedHashMap[String, Double]()
    val t0 = System.nanoTime()
    val traj = PipelineQueries.phraseBpeMerges(spark, sfDir, levels, stages)
    val wall = (System.nanoTime() - t0) / 1e9
    val rounds = traj.map(_._1).distinct.size
    println(f"== levels=$levels rounds=$rounds tot=${traj.size} wall=$wall%.1f " +
      stages.map { case (k, v) => f"$k=$v%.1f" }.mkString(" "))
    spark.stop()
  }
}
