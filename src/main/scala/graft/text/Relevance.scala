package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: BM25 (Robertson & Walker 1994, public
  * knowledge) over the whitespace-token inverted-index shape.
  *
  * The 100 TB shape: one corpus scan explodes to (doc, term) postings
  * RESTRICTED to the query terms (the filter sits under the explode, so
  * the shuffle carries only matching postings); document frequencies are
  * a tiny per-term aggregate joined back by broadcast; the per-doc score
  * folds its ≤|terms| partials in ascending-term order (sequential fp —
  * bit-stable and oracle-mirrorable); the final top-k is a distributed
  * TakeOrdered, never a global window.
  */
object Relevance {

  /** BM25 top-`topK` documents for a bag-of-terms query.
    *
    * score(d) = Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5)) ·
    *            tf · (k1+1) / (tf + k1·(1 − b + b·dl/avdl))
    *
    * Ranking uses the 6-decimal-rounded score (ties broken by id), so
    * sub-ulp `ln` differences across platforms cannot flip ranks.
    * Output: (rank, idCol, score).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    val toks = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__w"))
      .withColumn("__dl", size(col("__w")))
    val stats = toks.agg(count(lit(1)).as("__n"),
      sum(col("__dl").cast("long")).as("__sdl"))
    val tf = toks
      .select(col(idCol), col("__dl"), explode(col("__w")).as("__tok"))
      .filter(col("__tok").isin(terms: _*))
      .groupBy(col(idCol), col("__dl"), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
    val df_t = tf.groupBy("__tok").agg(countDistinct(col(idCol)).as("__df"))
    val parts = tf
      .join(broadcast(df_t), Seq("__tok"))
      .crossJoin(broadcast(stats))
      .withColumn("__avdl", col("__sdl").cast("double") / col("__n"))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__part",
        col("__idf") * (col("__tf") * lit(k1 + 1.0)) /
          (col("__tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avdl"))))
    val scored = parts.groupBy(idCol)
      .agg(graft.Rounding.pround(
        aggregate(
          transform(array_sort(collect_list(struct(col("__tok"), col("__part")))),
            s => s.getField("__part")),
          lit(0.0), (acc, x) => acc + x), 6).as("score"))
    val top = scored.orderBy(col("score").desc, col(idCol).asc).limit(topK)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col(idCol).asc)))
      .select(col("rank"), col(idCol), col("score"))
  }
}
