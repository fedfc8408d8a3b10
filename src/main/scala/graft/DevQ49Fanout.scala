package graft

import org.apache.spark.sql.functions._

/** Dev-only: q49 banded-join fan-out audit (round-8 verdict #4 — the
  * driver bench measured q49 at 2.75 s vs its 0.59 s history and the
  * revisit pass did not recover it). Prints, per band, the bucket-size
  * distribution and the candidate-pair mass Σ|bucket|² the banded
  * equi-join actually generates on the CURRENT documents corpus, plus
  * the surviving pair count — if the regenerated corpus had grown the
  * fan-out, it would show here as candidate mass, not scheduling noise.
  */
object DevQ49Fanout {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    import graft.text.{Dedup, TextOps}
    val fps = Dedup.simhashAgg(Tables.documents(spark, sfDir), "doc_id",
      TextOps.wordShingles(col("text"), 3), 60)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = fps.count()
    val bits = 60
    val nBands = 7
    val widths = Array.tabulate(nBands)(i => bits / nBands + (if (i < bits % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val bandStructs = (0 until nBands).map { i =>
      val mask = (1L << widths(i)) - 1
      struct(lit(i).as("band"),
        shiftright(col("simhash"), offsets(i)).bitwiseAND(lit(mask)).as("band_val"))
    }
    val buckets = fps.select(explode(array(bandStructs: _*)).as("b"))
      .groupBy(col("b.band").as("band"), col("b.band_val").as("band_val"))
      .agg(count(lit(1)).as("n"))
      .persist()
    val perBand = buckets.groupBy("band")
      .agg(count(lit(1)).as("n_buckets"), max("n").as("max_bucket"),
        sum((col("n") * (col("n") - 1) / 2).cast("long")).as("cand_pairs"))
      .orderBy("band").collect()
    println(f"== docs=$nDocs")
    perBand.foreach { r =>
      println(f"== band ${r.getInt(0)}: buckets=${r.getLong(1)} max=${r.getLong(2)} cand_pairs=${r.getLong(3)}")
    }
    val totalCand = perBand.map(_.getLong(3)).sum
    val survivors = Dedup.simhashNearDupPairs(fps, "doc_id", "simhash",
      maxHamming = 6, bits = 60).count()
    println(f"== total candidate pairs=$totalCand survivors=$survivors " +
      f"quad_equiv=${nDocs * (nDocs - 1) / 2} ratio=${totalCand.toDouble / math.max(1L, nDocs * (nDocs - 1) / 2)}%.4f")
    spark.stop()
  }
}
