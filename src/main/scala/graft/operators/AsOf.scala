package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-join operators Spark lacks natively: the pandas
  * `merge_asof` backward join (the reference's ecosystem's canonical
  * time-series join) and gap-based sessionization.
  *
  * Both are implemented as SINGLE-SHUFFLE window plans — no custom
  * physical operator is needed because the union-then-window encoding
  * expresses as-of semantics exactly, and Catalyst's streaming window
  * frames keep per-key state O(1). At 100 TB both shuffle once on the
  * key and stream each key's timeline through one task.
  */
object AsOf {

  /** Backward inclusive as-of join (pandas `merge_asof(direction=
    * "backward")`): for every left row, the single right row of the same
    * `keyCol` with the greatest `tsCol` ≤ the left row's — equal
    * timestamps DO match, mirroring pandas/DuckDB ASOF.
    *
    * Encoding: tag rights 0 / lefts 1, union, and take
    * `last(right_payload, ignoreNulls)` over (key, ts, side, tie) with an
    * unbounded-preceding frame — rights sort before lefts at equal ts, so
    * the carried payload is exactly the as-of match. One shuffle, no
    * join fan-out, no range-condition explosion; rights with duplicate
    * (key, ts) are pre-deduped to the max `tieCol` row so the match is
    * deterministic.
    *
    * @param leftPayload  columns of `left` to carry (beyond key/ts/tie)
    * @param rightPayload columns of `right` to surface (null when no
    *                     right row precedes the left row)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, leftPayload: Seq[String],
      rightPayload: Seq[String]): DataFrame = {
    val dedupW = Window.partitionBy(keyCol, tsCol).orderBy(col(tieCol).desc)
    val r = right
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col(tsCol), col(tieCol),
        struct(rightPayload.map(col): _*).as("__r"))
    val l = left
      .select(col(keyCol), col(tsCol), col(tieCol),
        struct(leftPayload.map(col): _*).as("__l"))
    // Union with the other side's payload as a typed null struct.
    val rAligned = r.select(col(keyCol), col(tsCol), col(tieCol),
      lit(0).as("__side"), col("__r"),
      lit(null).cast(l.schema("__l").dataType).as("__l"))
    val lAligned = l.select(col(keyCol), col(tsCol), col(tieCol),
      lit(1).as("__side"), lit(null).cast(r.schema("__r").dataType).as("__r"),
      col("__l"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__side").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rAligned.unionByName(lAligned)
      .withColumn("__match", last("__r", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        Seq(col(keyCol), col(tsCol), col(tieCol)) ++
          leftPayload.map(c => col(s"__l.$c").as(c)) ++
          rightPayload.map(c => col(s"__match.$c").as(s"r_$c")): _*)
  }

  /** Gap-based sessionization: rows of one key more than `gap` apart (in
    * `tsCol` units) start a new session; `session_id` is the 1-based
    * running count of session starts per key. Two window passes over one
    * (key, ts, tie) sort — the batch form of Spark's streaming
    * `session_window`.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gap: Long): DataFrame = {
    val ord = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__prev", lag(col(tsCol), 1).over(ord))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gap, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("__new").over(run))
      .drop("__prev", "__new")
  }
}
