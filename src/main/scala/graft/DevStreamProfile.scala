package graft

/** Dev-only: micro-batch-level profile of the streaming family's fixed
  * floor (round-8 verdict #7). Registers a StreamingQueryListener and
  * runs the named streaming queries, printing each micro-batch's
  * duration breakdown (addBatch / getBatch / walCommit / stateUpdate
  * etc.) — the evidence for which machinery component owns the
  * ~1.5-2 s/query floor and whether any query runs more batches than
  * its semantics need.
  *
  * Usage: runMain graft.DevStreamProfile q112_stream_ohlcv ...
  */
object DevStreamProfile {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q112_stream_ohlcv")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        events.add(f"start ${e.name} at ${System.nanoTime() / 1e9}%.2f")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        events.add(f"batch ${p.batchId} rows=${p.numInputRows} " +
          f"triggerExec=${dur.getOrDefault("triggerExecution", -1L)} " +
          f"addBatch=${dur.getOrDefault("addBatch", -1L)} " +
          f"getBatch=${dur.getOrDefault("getBatch", -1L)} " +
          f"latestOffset=${dur.getOrDefault("latestOffset", -1L)} " +
          f"queryPlanning=${dur.getOrDefault("queryPlanning", -1L)} " +
          f"walCommit=${dur.getOrDefault("walCommit", -1L)} " +
          f"commitOffsets=${dur.getOrDefault("commitOffsets", -1L)} " +
          f"stateRows=${p.stateOperators.map(_.numRowsTotal).sum}")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        events.add(f"end at ${System.nanoTime() / 1e9}%.2f")
    })
    names.foreach { name =>
      // warm rep then profiled rep
      SparkEntry.queries(name)(spark, sfDir).count()
      events.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(f"== $name wall=$wall%.2f")
      events.forEach(e => println(s"==   $e"))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
