package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/** Eager release of `localCheckpoint(true)` block storage.
  *
  * A locally-checkpointed Dataset's blocks are reclaimed by the
  * ContextCleaner only when the wrapping RDD is garbage-collected — in a
  * long-lived session that latency piles checkpoints from finished
  * queries on top of the running one's working set (round-16 verdict:
  * q296's bounded-propagation rounds left one block per round resident
  * and a cross-suite retention pin fired). Iterative operators that
  * checkpoint per round can instead hand each superseded round's frame
  * here the moment its successor is materialized.
  *
  * Precision matters for concurrency: a `getPersistentRDDs` before/after
  * diff would race with sibling jobs on the shared session (q296 runs
  * its four tier audits concurrently), so the release targets exactly
  * the RDD behind THIS frame — the `LogicalRDD` a checkpoint returns —
  * and no-ops on any other plan shape.
  *
  * Safety contract: callers release a frame only after every consumer
  * has run. A locally-checkpointed RDD's lineage is truncated, so its
  * data is unrecoverable after release (Spark logs that warning on
  * unpersist; the release is non-blocking).
  */
object CheckpointRelease {

  /** The persisted RDD behind a checkpointed frame, if the plan is the
    * `LogicalRDD` that `Dataset.localCheckpoint` produces.
    */
  def checkpointRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df match {
      case c: classic.Dataset[_] =>
        c.queryExecution.analyzed match {
          case l: LogicalRDD
              if l.rdd.getStorageLevel.useMemory ||
                l.rdd.getStorageLevel.useDisk =>
            Some(l.rdd)
          case _ => None
        }
      case _ => None
    }

  /** Drop the checkpoint blocks behind `df` now instead of at
    * ContextCleaner dereference latency. Non-blocking; no-op when `df`
    * is not a materialized checkpoint.
    */
  def release(df: Dataset[_]): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))
}
