package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Complements [[Packing.hashSplit]] (train/val routing): here the goal is
  * REBALANCING — drawing a stratified sample so every stratum (language,
  * source, quality bucket, …) contributes equally, the standard mitigation
  * for language/domain skew in web corpora (public knowledge; e.g. the
  * CCNet/mC4 per-language sampling stage).
  */
object Sampling {

  /** Balanced stratified sample: keep each row of stratum `l` with
    * probability `min_count / count(l)`, so every stratum's expected
    * sampled size equals the SMALLEST stratum's size.
    *
    * Selection is a deterministic hash coin: row kept iff
    * `md5Hash60(salt ':' id) mod 1e6 < floor(min_count·1e6 / count(l))`.
    * Pure integer arithmetic end-to-end (no floating-point rate, no RNG
    * state), so the sample is reproducible on any cluster layout, stable
    * under re-partitioning, and oracle-checkable.
    *
    * Shape at 100 TB: one aggregation for the stratum histogram (tiny),
    * broadcast back as an equi-join on the stratum key, then a codegen'd
    * hash filter — the corpus itself is scanned once and never shuffled.
    */
  def balancedSample(df: DataFrame, idCol: String, stratumCol: String,
      salt: String): DataFrame = {
    val counts = df.groupBy(stratumCol).count()
      .withColumn("__target", min("count").over(Window.partitionBy()))
      // 1e6-granular integer threshold: target·1e6 div count (exact
      // integer division — `div`, not `/`, which is DOUBLE in Spark SQL).
      .withColumn("__thresh", expr("(__target * 1000000L) div `count`"))
      .select(col(stratumCol), col("__thresh").cast("long").as("__thresh"))
    df.join(broadcast(counts), stratumCol)
      .filter(
        pmod(TextOps.md5Hash60(
          concat(lit(salt), lit(":"), col(idCol).cast("string"))),
          lit(1000000L)) < col("__thresh"))
      .drop("__thresh")
  }
}
