package graft

import org.apache.spark.sql.functions._

/** Dev-only: stage timing for q215 at a blow-up dir, to attribute its
  * 30× octave step (SCALING.md). Times: tokenize+count materialization,
  * the token-stats aggregation, and the final score join separately.
  */
object DevQ215Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale30"
    val spark = Session.get()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $tag%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"== rep $rep")
      val nb = t("nb_build")(Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          explode(graft.text.TextOps.tokens(col("text"))).as("w0"))
        .select(col("doc_id"), col("source"), lower(col("w0")).as("w"))
        .groupBy("doc_id", "source", "w").agg(count(lit(1)).as("nb"))
        .localCheckpoint(true))
      t("nb_rows")(println("   rows: " + nb.count()))
      val byTok = nb.groupBy("w").agg(
        sum(when(col("source") === "src0", col("nb")).otherwise(0L)).as("chi"),
        sum(when(col("source") =!= "src0", col("nb")).otherwise(0L)).as("clo"))
      t("bytok")(println("   vocab: " + byTok.count()))
      val totals = byTok.agg(sum("chi").as("thi"), sum("clo").as("tlo"),
        count(lit(1)).as("v"))
      def qln(c: org.apache.spark.sql.Column) =
        floor(log(c.cast("double")) * 1e9 + 0.5).cast("long")
      val weights = byTok.crossJoin(broadcast(totals))
        .select(col("w"),
          (qln(col("chi") + 1) - qln(col("thi") + col("v")) -
            qln(col("clo") + 1) + qln(col("tlo") + col("v"))).as("lo_q"))
      val fin = nb.join(broadcast(weights), "w")
        .groupBy("doc_id")
        .agg(sum(col("nb")).as("n_tokens"),
          pround(sum(col("nb") * col("lo_q")).cast("double") / 1e9, 6)
            .as("nb_score"))
        .orderBy("doc_id")
      t("final")(println("   docs: " + fin.count()))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
  private def pround(c: org.apache.spark.sql.Column, s: Int) =
    graft.Rounding.pround(c, s)
}
