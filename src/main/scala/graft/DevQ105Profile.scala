package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q105_winnowing: is the wall the per-gram
  * md5-hex-conv hash, the per-doc bounded window, or the distinct?
  *
  * Usage: tools/run_main.sh graft.DevQ105Profile [sfDir]
  */
object DevQ105Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Session.get()
    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    import org.apache.spark.sql.expressions.Window
    val k = 4; val w = 5
    def upTo(n: org.apache.spark.sql.Column) =
      slice(sequence(lit(1), greatest(n, lit(1))), lit(1), greatest(n, lit(0)))
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    def grams = Tables.documents(spark, sfDir)
      .select(col("doc_id"), norm.as("__t"))
      .select(col("doc_id"), col("__t"),
        explode(upTo(length(col("__t")) - (k - 1))).as("pos"))
    def hashed = grams.select(col("doc_id"), col("pos"),
      graft.text.TextOps.md5Hash60(col("__t").substr(col("pos"), lit(k))).as("__h"))
    val frame = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    def windowed = hashed
      .withColumn("__min", min("__h").over(frame))
      .withColumn("__wc", count(lit(1)).over(frame))
      .filter(col("__wc") === w)
      .select(col("doc_id"), col("__min").as("fp"))
    val run = Window.partitionBy("doc_id").orderBy("pos")
    def pref = hashed
      .withColumn("__min", min("__h").over(frame))
      .withColumn("__wc", count(lit(1)).over(frame))
      .withColumn("__prev", lag("__min", 1).over(run))
      .filter(col("__wc") === w &&
        (col("__prev").isNull || col("__prev") =!= col("__min")))
      .select(col("doc_id"), col("__min").as("fp"))
    // JIT warmup
    t(windowed.distinct().count())
    for (rep <- 1 to 3) {
      val tg = t(grams.count())
      val th = t(hashed.count())
      // cheap 60-bit hash in place of md5-hex-conv, same row count
      val tx = t(grams.select(col("doc_id"), col("pos"),
        (xxhash64(col("__t").substr(col("pos"), lit(k))) % lit(1L << 60)).as("__h")).count())
      val tw = t(windowed.count())
      val tp = t(pref.count())
      val tf = t(windowed.distinct().count())
      val tf2 = t(pref.distinct().count())
      val tf3 = t(pref.distinct().orderBy("doc_id", "fp").count())
      println(f"== Q105 rep $rep grams $tg%.2f md5hash $th%.2f xxhash $tx%.2f window $tw%.2f prefilter $tp%.2f olddistinct $tf%.2f newdistinct $tf2%.2f +orderby $tf3%.2f")
    }
    spark.stop()
  }
}
