package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit scale utilities for the shapes AQE alone doesn't fix:
  * skewed-key joins (salting) and repeated co-located joins (bucketing).
  * These complement the planner — AQE's skew-join split handles sort-merge
  * skew at runtime, but salting is the declarative fallback when a single
  * key's fan-out must be bounded by construction, and bucketing removes
  * the shuffle from every future join at write time.
  */
object Scale {

  /** Skew-safe equi-join: the big side gets a random-but-deterministic
    * salt in [0, saltFactor); the small side is replicated once per salt
    * value. A key holding p% of the big table spreads over `saltFactor`
    * tasks instead of one. Semantically identical to
    * `big.join(small, keys, "inner")` for duplicate-free `small` keys.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Write a bucketed+sorted table: every later equi-join or aggregation
    * on `cols` against a co-bucketed table runs shuffle-free (verified in
    * ScaleSpec by asserting the join plan has no shuffle exchange).
    */
  def writeBucketed(df: DataFrame, tableName: String, buckets: Int,
      cols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
}
