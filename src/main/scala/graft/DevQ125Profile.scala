package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q125_dedup_apply's scaling slope
  * (round-8 verdict #5: 3.87× wall for 3× data at the 30× octave is the
  * only at-or-above-linear row left in SCALING.md — name the component).
  * Forces each plan segment separately at the base corpus and at
  * DevScaling blow-ups: fingerprint build, banded near-dup pairs,
  * connected components (WITH the round count — the diameter-bound
  * suspect), and the left-anti apply join.
  *
  * Usage: runMain graft.DevQ125Profile [factors...] (default 10 30)
  */
object DevQ125Profile {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 30)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    import graft.text.{Dedup, TextOps}
    factors.foreach(f =>
      DevScaling.buildBlowup(spark, base, s"/tmp/graft_scale$f", f))

    def profile(dir: String): (Double, Double, Double, Double, Long, Long, Int) = {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      def t[A](f: => A): (Double, A) = {
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val docs = Tables.documents(spark, dir)
      val fps = Dedup.simhashAgg(docs, "doc_id",
        TextOps.wordShingles(col("text"), 3), 60).persist(lvl)
      val (tFps, _) = t(fps.count())
      val pairs = Dedup.simhashNearDupPairs(fps, "doc_id", "simhash",
        maxHamming = 6, bits = 60).persist(lvl)
      val (tPairs, nPairs) = t(pairs.count())
      val rounds = new java.util.concurrent.atomic.AtomicInteger(0)
      val (tCc, losers) = t {
        val l = Dedup.connectedComponents(pairs, roundsOut = rounds)
          .filter(col("id") =!= col("cluster"))
          .select(col("id").as("doc_id"))
        l.count(); l
      }
      val (tApply, nOut) = t(
        docs.join(losers, Seq("doc_id"), "left_anti")
          .select("doc_id", "lang", "source").orderBy("doc_id").count())
      fps.unpersist(); pairs.unpersist()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      (tFps, tPairs, tCc, tApply, nPairs, nOut, rounds.get())
    }

    // Warm once, then min-of-two per dir.
    profile(base)
    def best(dir: String) = (1 to 2).map(_ => profile(dir))
      .minBy(r => r._1 + r._2 + r._3 + r._4)
    val b = best(base)
    println(f"== base: fps=${b._1}%.2f pairs=${b._2}%.2f cc=${b._3}%.2f(rounds=${b._7}) apply=${b._4}%.2f n_pairs=${b._5} n_out=${b._6}")
    factors.foreach { f =>
      val g = best(s"/tmp/graft_scale$f")
      println(f"== ${f}x: fps=${g._1}%.2f(${g._1 / b._1}%.1fx) pairs=${g._2}%.2f(${g._2 / b._2}%.1fx) " +
        f"cc=${g._3}%.2f(${g._3 / b._3}%.1fx, rounds=${g._7}) apply=${g._4}%.2f(${g._4 / b._4}%.1fx) " +
        f"n_pairs=${g._5} n_out=${g._6}")
    }
    spark.stop()
  }
}
