package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profile for q206_exact_substr and q42_ngram_jaccard —
  * the round-10 driver drift attribution (r10 verdict "What's wrong" #1:
  * q206 +0.69 s r/r, q42 +0.25 s, neither plan touched in r10). Times
  * each pipeline's cumulative prefixes so stage costs fall out as
  * deltas, repeated `reps` times so the rep-to-rep noise band is on
  * record next to the stage split.
  *
  * Usage: runMain graft.DevQ206Profile [reps]
  */
object DevQ206Profile {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    import org.apache.spark.sql.expressions.Window
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    def t(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (1 to reps).foreach { rep =>
      // --- q206 stages (cumulative prefixes of exactSubstrSpans) ---
      val docs = PipelineQueries.exactSubstrUniverse(spark, sfDir, 30)
      val grams = docs.select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, length(text) - 30), i -> substring(text, i + 1, 30))")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("gram"))
      val (tG, nG) = t(grams.count()); drop()
      val dup = grams
        .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("gram")))
        .filter(col("__cnt") >= 2).select("doc_id", "pos")
      val (tD, nD) = t(dup.count()); drop()
      val (tS, nS) = t(PipelineQueries
        .exactSubstrSpans(docs, 30).count()); drop()
      println(f"== q206 rep$rep grams $tG%.2f s ($nG rows) | +gramcount ${tD}%.2f s ($nD dup pos) | full ${tS}%.2f s ($nS spans) | stage split: explode=$tG%.2f window=${tD - tG}%.2f spanmerge=${tS - tD}%.2f")
      // --- q42 stages (PPJoin: index build vs join+verify) ---
      val d42 = Tables.documents(spark, sfDir)
      val ranked = d42
        .select(col("doc_id"), explode(array_distinct(
          graft.text.TextOps.wordShingles(col("text"), 3))).as("__s"))
        .select(col("doc_id"), graft.text.TextOps.md5Hash60(col("__s")).as("shingle"))
        .distinct()
        .withColumn("__f", count(lit(1)).over(Window.partitionBy("shingle")))
        .withColumn("__r", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("__f").asc, col("shingle").asc)))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy("doc_id")))
      val (tI, nI) = t(ranked.count()); drop()
      val (tF, nF) = t(graft.text.Dedup.ngramJaccardPairs(
        d42, "doc_id", "text", 3, 0.5).count()); drop()
      println(f"== q42  rep$rep index $tI%.2f s ($nI rows) | full ${tF}%.2f s ($nF pairs) | join+verify=${tF - tI}%.2f")
    }
    spark.stop()
  }
}
