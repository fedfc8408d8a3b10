package graft

/** Dev-only: time one query repeatedly; optionally print its plan.
  * Usage: runMain graft.DevTime <name> <sfDir> [reps] [explain]
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Session.get()
    val fn = SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, dir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"== $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
