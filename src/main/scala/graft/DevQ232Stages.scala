package graft

import org.apache.spark.sql.functions._

/** Dev-only: attribute q232_effective_tokens' cold cost (r17 driver run:
  * 22.8 s first / 16.0 s revisit vs 1.8 s warm) to named stages. q125
  * shares the whole dedupSurvivors prefix yet runs 2.2 s cold, so the
  * delta must live in the tok⋈kept join or the final rollup.
  */
object DevQ232Stages {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    SparkEntry.queries("q01_pricing_summary")(spark, d).count()
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q232] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    drop()
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      // Stage A: the q125 prefix (simhash fps + pairs + CC eager build)
      val surv = t("dedupSurvivors build (eager CC)") {
        PipelineQueries.dedupSurvivorsForDev(spark, d)
      }
      val kept = surv.select(col("doc_id")).withColumn("__kept", lit(1L))
      // Stage B: the token-count side alone
      val tok = Tables.documents(spark, d)
        .select(col("doc_id"), col("source"),
          size(graft.text.TextOps.tokens(col("text"))).cast("long").as("nt"))
      t("tok agg alone (noop)") {
        tok.write.format("noop").mode("overwrite").save()
      }
      // Stage C: the full registered plan
      t("full q232 action") {
        SparkEntry.queries("q232_effective_tokens")(spark, d).count()
      }
      // Stage D: the join without the rollup
      t("tok join kept (noop)") {
        tok.join(kept, Seq("doc_id"), "left")
          .write.format("noop").mode("overwrite").save()
      }
      drop()
    }
    spark.stop()
  }
}
