package graft

/** Dev-only: dump formatted physical plans for selected queries. */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = Session.get()
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_project", "q06_broadcast_join", "q07_window_topk",
        "q30_knn_cosine", "q21_gapfill_ffill")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
