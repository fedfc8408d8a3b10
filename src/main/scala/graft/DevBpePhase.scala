package graft

/** Dev-only: per-phase wall breakdown of the q260 phrase-BPE loop —
  * pool job (pair agg + TakeOrdered collect) vs driver acceptance vs
  * state apply — to attribute the trainer's round floor to a NAMED
  * stage instead of guessing. Every stage is the PRODUCTION kernel
  * called through PipelineQueries (phraseSeqs / phraseBpePool /
  * phraseBpeAccept / phraseBpeApply) — round-12 ADVICE #4: a probe
  * that duplicates the loop silently de-syncs from the thing it
  * measures the moment the production loop is edited.
  */
object DevBpePhase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val levels = args.headOption.map(_.toInt).getOrElse(8)
    val spark = Session.get()
    var cur = PipelineQueries.phraseSeqs(spark, sfDir)
    var tPool = 0.0; var tAcc = 0.0; var tApply = 0.0
    var rounds = 0; var tot = 0
    def sec[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    while (rounds < 96 && tot < 1024) {
      rounds += 1
      val (pool, t1) = sec { PipelineQueries.phraseBpePool(cur) }
      tPool += t1
      val (accepted, t2) = sec { PipelineQueries.phraseBpeAccept(pool, levels) }
      tAcc += t2
      if (accepted.isEmpty) { rounds = 97 }
      else {
        val (next, t3) = sec {
          PipelineQueries.phraseBpeApply(spark, cur,
            accepted.map { case (l, r, _, _) => (l, r) })
            .localCheckpoint(false)
        }
        tApply += t3
        cur = next
        tot += accepted.size
      }
    }
    println(f"== levels=$levels rounds=$rounds tot=$tot " +
      f"pool=$tPool%.1f accept=$tAcc%.1f apply=$tApply%.1f")
    spark.stop()
  }
}
