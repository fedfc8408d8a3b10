package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only attribution probe for q42's 100× wall (SCALING.md round-11):
  * is the bend candidate mass or constant-factor index pressure? Counts
  * the PPJoin pipeline's actual intermediates at base and at a blowup
  * dir — distinct (doc, shingle) index rows, prefix rows, and candidate
  * pairs after the prefix join + length filter (the exact stages of
  * Dedup.ngramJaccardPairs, re-derived here so the probe can stop at
  * each stage).
  *
  * Usage: tools/run_main.sh graft.DevQ42Probe [factor]
  */
object DevQ42Probe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 100
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"/tmp/graft_scale$factor"
    val spark = Session.get()
    DevScaling.buildBlowup(spark, base, out, factor)
    val threshold = 0.5
    def stages(d: String): (Long, Long, Long) = {
      val ranked = Tables.documents(spark, d)
        .select(col("doc_id"), explode(array_distinct(
          graft.text.TextOps.wordShingles(col("text"), 3))).as("__s"))
        .select(col("doc_id"), graft.text.TextOps.md5Hash60(col("__s")).as("shingle"))
        .distinct()
        .withColumn("__f", count(lit(1)).over(Window.partitionBy("shingle")))
        .withColumn("__r", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("__f").asc, col("shingle").asc)))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy("doc_id")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nIndex = ranked.count()
      val prefix = ranked
        .filter(col("__r") <= floor((lit(1.0) - threshold) * col("__n")) + 1)
        .select(col("shingle"), col("doc_id"), col("__n"))
      val nPrefix = prefix.count()
      val nCand = prefix.as("a").join(prefix.as("b"), Seq("shingle"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .filter(least(col("a.__n"), col("b.__n")) >=
          lit(threshold) * greatest(col("a.__n"), col("b.__n")))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
        .count()
      ranked.unpersist()
      (nIndex, nPrefix, nCand)
    }
    val (i1, p1, c1) = stages(base)
    val (iN, pN, cN) = stages(out)
    println(s"== q42probe base  index $i1 prefix $p1 candidates $c1")
    println(s"== q42probe x$factor index $iN prefix $pN candidates $cN")
    println(f"== q42probe growth index ${iN.toDouble / i1}%.1fx prefix ${pN.toDouble / p1}%.1fx candidates ${cN.toDouble / c1}%.1fx (data ${factor}x)")
    spark.stop()
  }
}
