package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only: run queries and report total shuffle WRITE bytes per query
  * (summed over all stages of all jobs the query triggers) — the metric
  * that shows whether a narrower shuffle key actually narrows the
  * shuffle. Usage: runMain graft.DevShuffle <sfDir> <name> [name ...]
  */
object DevShuffle {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val spark = Session.get()
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        rows.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // cold: fills caches, JIT
      Thread.sleep(1500)     // drain listener bus before zeroing
      bytes.set(0L); rows.set(0L)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)     // listener events are async
      println(f"== $name: shuffle_write=${bytes.get() / 1024.0 / 1024.0}%.2f MiB " +
        f"(${rows.get()} records), $sec%.2f s, $n rows")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
