package graft

/** Dev-only measurement-semantics probe: `.count()` (Bench's metric)
  * lets Catalyst prune computed columns a bare count doesn't need,
  * while `.rdd.count()` forces every output column but adds an
  * InternalRow→Row serialization tax unrelated to the query (measured:
  * +0.4 s on q01's FOUR output rows). Neither is "the" truth; Bench
  * keeps `.count()` for cross-round and BASELINE comparability and
  * SCALING.md records which queries the pruning affects.
  *
  * Usage: runMain graft.DevCountProbe [name ...]
  */
object DevCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q28_savgol", "q208_exact_substr_apply", "q01_pricing_summary")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, dir).count() // warm
      val t0 = System.nanoTime(); fn(spark, dir).count()
      val tCount = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); fn(spark, dir).rdd.count()
      val tRdd = (System.nanoTime() - t1) / 1e9
      println(f"== $n%-26s count $tCount%6.2f s   rdd.count $tRdd%6.2f s")
    }
    spark.stop()
  }
}
