package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, NullsFirst, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension: a native backward as-of join.
  *
  * The engine already expresses as-of semantics as a union-then-window
  * plan (graft.operators.AsOf, q121) — one shuffle, streaming frame.
  * This is the OTHER sanctioned implementation strategy from the build
  * plan: a first-class logical operator + planner strategy + physical
  * exec, the path a production engine takes when an operator deserves
  * its own physical algorithm rather than an encoding. The exec asks
  * Catalyst for hash co-partitioning on the key and (key, ts, tie)
  * intra-partition order on BOTH sides (EnsureRequirements inserts the
  * exchanges/sorts — and elides them when the child is already
  * partitioned, e.g. a bucketed scan), then merges each co-partition
  * pair with a single forward pass: O(|L|+|R|) per partition, zero
  * buffering beyond one candidate row per key.
  *
  * Semantics (pandas `merge_asof(direction="backward")`, DuckDB
  * `ASOF LEFT JOIN`): every left row picks the right row of the same key
  * with the greatest ts ≤ its own; right ties on (key, ts) resolve to the
  * greatest tie column, matching the window encoding's keep-last rule.
  *
  * At 100 TB this plan is strictly better than the union encoding when
  * the right side is much smaller than the left (the union plan sorts
  * L+R rows through one window; this sorts the two sides independently,
  * so the wide left side's sort does not carry right-side payload
  * columns) and identical in shuffle count otherwise.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTs: Expression,
    leftTie: Expression,
    rightKey: Expression,
    rightTs: Expression,
    rightTie: Expression,
    rightPayload: Seq[Attribute])
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical as-of join to its exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(planLater(j.left), planLater(j.right), j.leftKey,
        j.leftTs, j.leftTie, j.rightKey, j.rightTs, j.rightTie,
        j.rightPayload, j.output) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTs: Expression,
    leftTie: Expression,
    rightKey: Expression,
    rightTs: Expression,
    rightTie: Expression,
    rightPayload: Seq[Attribute],
    output: Seq[Attribute])
    extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  private def ord(k: Expression, ts: Expression, tie: Expression): Seq[SortOrder] =
    Seq(SortOrder(k, Ascending, NullsFirst, Seq.empty),
      SortOrder(ts, Ascending, NullsFirst, Seq.empty),
      SortOrder(tie, Ascending, NullsFirst, Seq.empty))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(ord(leftKey, leftTs, leftTie), ord(rightKey, rightTs, rightTie))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = ord(leftKey, leftTs, leftTie)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyE = leftKey; val lTsE = leftTs
    val rKeyE = rightKey; val rTsE = rightTs
    val payload = rightPayload
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyE), lOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsE), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyE), rOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsE), rOut)
      val rPayProj = UnsafeProjection.create(payload, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKeyE.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsE.dataType))
      // Bind the output against NULLABLE payload attrs: the pad row for
      // unmatched lefts is all-null even when the right column itself is
      // non-nullable, and a nullable=false binding would skip the null
      // check and read zeros.
      val outProj =
        UnsafeProjection.create(out, lOut ++ payload.map(_.withNullability(true)))
      val nullPay = new GenericInternalRow(payload.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // Lookahead on the right side; key/ts copied out of the
        // projection buffers because they outlive the next projection.
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTs: InternalRow = _
        // Last right row consumed (the running as-of candidate) and the
        // key it belongs to; stale candidates are ignored by key compare.
        private var candPay: InternalRow = _
        private var candKey: InternalRow = _
        advanceRight()

        // SQL comparison semantics: a NULL key or NULL ts never matches
        // (pandas merge_asof and DuckDB ASOF agree, as does the q121
        // window encoding where `ts <= lts` evaluates to NULL). The
        // natural ordering sorts NULLs FIRST, so null-keyed/null-ts right
        // rows are skipped on load and null-keyed/null-ts left rows
        // short-circuit to the null pad.
        private def advanceRight(): Unit = {
          rRow = null; rKey = null; rTs = null
          while (rRow == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            if (!k.isNullAt(0)) {
              val t = rTsProj(r)
              if (!t.isNullAt(0)) {
                rRow = r; rKey = k.copy(); rTs = t.copy()
              }
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          if (lk.isNullAt(0)) return outProj(joined(l, nullPay))
          // lk's buffer is reused by the NEXT left row, not during the
          // right-side advance below (different projection instances).
          while (rRow != null && keyOrd.compare(rKey, lk) < 0) advanceRight()
          val lts = lTsProj(l)
          if (lts.isNullAt(0)) return outProj(joined(l, nullPay))
          while (rRow != null && keyOrd.compare(rKey, lk) == 0 &&
              tsOrd.compare(rTs, lts) <= 0) {
            candPay = rPayProj(rRow).copy()
            candKey = rKey // already a copy owned by us
            advanceRight()
          }
          val matched = candKey != null && keyOrd.compare(candKey, lk) == 0
          outProj(joined(l, if (matched) candPay else nullPay))
        }
      }
    }
  }
}
