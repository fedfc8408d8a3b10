package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextOps}

/** Dev-only: stage timings for the jaccard pipeline. */
object DevJaccard {
  def main(args: Array[String]): Unit = {
    val spark = Session.get()
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, d)
    val sh = docs
      .select(col("doc_id"), explode(array_distinct(
        TextOps.wordShingles(col("text"), 3))).as("__s"))
      .select(col("doc_id"), TextOps.md5Hash60(col("__s")).as("shingle"))
      .distinct()
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val shp = sh.persist(StorageLevel.MEMORY_AND_DISK)
    time("sh materialize")(shp.count())
    val freq = shp.groupBy("shingle").agg(count(lit(1)).as("__f"))
    val ranked = shp.join(freq, "shingle")
      .withColumn("__r", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("__f").asc, col("shingle").asc)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val prefix = ranked
      .filter(col("__r") <= floor((lit(1.0) - 0.5) * col("__n")) + 1)
      .select(col("shingle"), col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("prefix materialize")(prefix.count())
    val candidates = prefix.as("a")
      .join(prefix.as("b"), Seq("shingle"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("candidates")(println("  n_cand=" + candidates.count()))
    val sets = shp.groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("__hs"), count(lit(1)).as("__n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("sets")(sets.count())
    val verified = candidates
      .join(sets.select(col("doc_id").as("id_a"), col("__hs").as("__hs_a"), col("__n").as("n_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("__hs").as("__hs_b"), col("__n").as("n_b")), "id_b")
      .withColumn("n_inter", size(array_intersect(col("__hs_a"), col("__hs_b"))))
      .withColumn("jaccard", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= 0.5)
    time("verified")(verified.count())
    spark.stop()
  }
}
