package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: for each entity, the entry
  * time into each stage of an ordered stage sequence, where stage k
  * counts only if it happens STRICTLY AFTER the entity's stage-(k-1)
  * entry (the standard product-analytics funnel rule).
  *
  * Shape at 100 TB: every stage is a conditional MIN over the same
  * `partitionBy(entity)` window, so Catalyst plans ONE hash exchange of
  * the event log and stacks the per-stage Window operators on top of it —
  * adding a stage costs zero extra shuffles. The final rollup is a hash
  * aggregation of one row per entity.
  */
object Funnel {

  /** Per-entity stage-entry times.
    *
    * Output: one row per entity, columns `t0 … t{k-1}` (the event-time of
    * the entity's entry into each stage; null once the funnel is broken).
    * `tsCol` must be a numeric event time (e.g. epoch µs) so the strict
    * `>` comparison is total.
    */
  def stageTimes(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(entityCol)
    val staged = stages.zipWithIndex.foldLeft(events) { case (df, (stage, i)) =>
      val cond =
        if (i == 0) col(typeCol) === stage
        else col(typeCol) === stage && col(tsCol) > col(s"t${i - 1}")
      df.withColumn(s"t$i", min(when(cond, col(tsCol))).over(w))
    }
    val aggs = stages.indices.map(i => first(col(s"t$i")).as(s"t$i"))
    staged.groupBy(entityCol).agg(aggs.head, aggs.tail: _*)
  }
}
