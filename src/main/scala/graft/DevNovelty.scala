package graft

import org.apache.spark.sql.functions._

/** Dev-only: stage attribution for q269's 30× bend — times the gram
  * explode, the first-seen aggregation, and the join-back separately
  * and prints the mass at each stage.
  */
object DevNovelty {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    def sec[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"== $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $a")
      a
    }
    val grams = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(array_distinct(
        graft.text.TextOps.wordShingles(col("text"), 3))).as("g"))
      .select(col("doc_id"), graft.text.TextOps.md5Hash60(col("g")).as("h"))
    sec("gram explode count")(grams.count())
    sec("gram explode count warm")(grams.count())
    val first = grams.groupBy("h").agg(min("doc_id").as("first_doc"))
    sec("first-seen agg")(first.count())
    val joined = grams.join(first, "h")
    sec("join-back")(joined.count())
    val out = joined.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
    sec("full rollup")(out.count())
    out.explain("formatted")
    spark.stop()
  }
}
