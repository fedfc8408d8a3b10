package graft

import org.apache.spark.sql.functions._

/** Dev-only: stage-level attribution of q288's 100× wall — times the
  * clf margin side, the NB side, and the final join/rollup separately
  * on SPARK_GRAFT_SF_DIR.
  */
object DevQ288Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale100")
    val spark = Session.get()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val wq = t("clf_fit_cold")(ClassifierQueries.clfFit(spark, d)._2)
    t("margins_count") {
      ClassifierQueries.marginsOf(spark, Tables.documents(spark, d), wq).count()
    }
    t("nb_count")(PipelineQueries.nbDocScores(spark, d).count())
    t("q288_full_1") {
      Queries.all.find(_.name == "q288_quality_clf_agreement").get
        .run(spark, d).collect()
    }
    t("q288_full_2") {
      Queries.all.find(_.name == "q288_quality_clf_agreement").get
        .run(spark, d).collect()
    }
    spark.stop()
  }
}
