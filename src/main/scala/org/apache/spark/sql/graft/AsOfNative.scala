package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.functions.col

/** Public builder for the native as-of join ([[AsOfJoinPlan]]).
  *
  * Lives under `org.apache.spark.sql` to reach `classic.Dataset.ofRows`
  * (the sanctioned out-of-tree pattern, same as [[ArrayDot]]). The right
  * side's key/ts/tie and payload are re-aliased to fresh attributes
  * before the node is built, so a self-join (both sides derived from the
  * same scan — the common case for event streams) never has ambiguous
  * attribute ids for the analyzer to untangle.
  *
  * Output: every `left` column, then the requested right payload columns
  * as `r_<name>` (NULL when no right row precedes the left row).
  */
object AsOfNative {

  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, rightPayload: Seq[String]): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[classic.SparkSession]
    val rAliased = right.select(
      col(keyCol).as("__asof_key") +: col(tsCol).as("__asof_ts") +:
        col(tieCol).as("__asof_tie") +:
        rightPayload.map(c => col(c).as(s"r_$c")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rAliased.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, keyCol), attr(lPlan, tsCol), attr(lPlan, tieCol),
      attr(rPlan, "__asof_key"), attr(rPlan, "__asof_ts"),
      attr(rPlan, "__asof_tie"),
      rightPayload.map(c => attr(rPlan, s"r_$c")))
    classic.Dataset.ofRows(spark, node)
  }
}
