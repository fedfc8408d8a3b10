package graft

/** Dev-only A/B for the round-10 verdict's cold-path question: how much
  * of the suite's cold total (first execution of each of 238 distinct
  * plans) would a suite-level shared cache recover?
  *
  *  - mode `clean`  — replicates Bench's cold pass exactly: each query
  *    once, in sorted order, every cached/persisted block dropped
  *    between queries.
  *  - mode `shared` — the UPPER BOUND of suite-level caching: the three
  *    base relations (documents / events / embeddings) are persisted and
  *    counted up front (fill time reported separately), and NOTHING is
  *    dropped between queries, so identical cached subtrees reuse across
  *    queries wherever the plan cache matches.
  *
  * If even the upper bound leaves the long tail standing, the r10
  * attribution holds: cold is per-plan analysis + codegen JIT, not IO —
  * and a shared persist does not belong in the bench protocol.
  *
  * Run each mode in a FRESH JVM (JIT state is the variable under test):
  *   tools/run_main.sh graft.DevColdPath clean
  *   tools/run_main.sh graft.DevColdPath shared
  */
object DevColdPath {
  def main(args: Array[String]): Unit = {
    val shared = args.contains("shared")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    // Same session warmup as Bench: first-ever class loading out of band.
    SparkEntry.queries.get("q01_pricing_summary")
      .foreach(fn => fn(spark, sfDir).count())
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    spark.sharedState.cacheManager.clearCache()

    var fill = 0.0
    if (shared) {
      val t0 = System.nanoTime()
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      Seq(Tables.documents(spark, sfDir), Tables.events(spark, sfDir),
        Tables.embeddings(spark, sfDir)).foreach { df =>
        df.persist(lvl); df.count()
      }
      fill = (System.nanoTime() - t0) / 1e9
    }

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      if (!shared) {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        spark.sharedState.cacheManager.clearCache()
      }
      name -> secs
    }
    val mode = if (shared) "shared" else "clean"
    val total = rows.map(_._2).sum
    println(f"== coldpath mode=$mode total ${total}%.2f s (+ fill $fill%.2f s) over ${rows.size} queries")
    rows.sortBy(-_._2).take(12).foreach { case (n, s) =>
      println(f"== coldpath top $n%-28s $s%6.2f")
    }
    val tail = rows.sortBy(-_._2).drop(30).map(_._2)
    println(f"== coldpath tail(208) total ${tail.sum}%.2f s, mean ${tail.sum / math.max(1, tail.size)}%.3f s")
    spark.stop()
  }
}
