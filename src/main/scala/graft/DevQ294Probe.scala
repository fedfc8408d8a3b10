package graft
import org.apache.spark.sql.functions._
object DevQ294Probe {
  def main(args: Array[String]): Unit = {
    val spark = Session.get()
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // candidate mass = sum over (pos,band,bv) of C(|bucket|,2) for video,
    // and over (band,bv) for image
    val vf = MediaQueries.videoFrameHashes(spark, d)
    def bandMass(df: org.apache.spark.sql.DataFrame, keys: Seq[String], hcol: String): Unit = {
      val bits = 60; val nBands = 7
      val widths = Array.tabulate(nBands)(i => bits / nBands + (if (i < bits % nBands) 1 else 0))
      val offsets = widths.scanLeft(0)(_ + _)
      val bandStructs = (0 until nBands).map { i =>
        val mask = (1L << widths(i)) - 1
        struct(lit(i).as("band"), shiftright(col(hcol), offsets(i)).bitwiseAND(lit(mask)).as("bv"))
      }
      val banded = df.select((keys.map(col) :+ explode(array(bandStructs: _*)).as("__b")): _*)
        .select((keys.map(col) ++ Seq(col("__b.band").as("band"), col("__b.bv").as("bv"))): _*)
      banded.groupBy((keys.filter(_ != "doc_id").map(col) ++ Seq(col("band"), col("bv"))): _*)
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2).as("candidates"), max("n").as("max_bucket")).show()
    }
    println("== video (pos,band,bv):")
    bandMass(vf, Seq("doc_id", "pos"), "fh")
    println("== image (band,bv):")
    bandMass(MediaQueries.imageFingerprints(spark, d), Seq("doc_id"), "phash")
    spark.stop()
  }
}
