package graft

/** Dev-only smoke: read every harness table, print schema + count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Session.get()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      val df = Tables.load(spark, dir, n)
      println(s"== $n: ${df.count()} rows; schema: ${df.schema.simpleString}")
    }
    val entry = SparkEntry.entry(spark)
    println(s"== entry rows: ${entry.count()}")
    entry.show(5, truncate = false)
    spark.stop()
  }
}
