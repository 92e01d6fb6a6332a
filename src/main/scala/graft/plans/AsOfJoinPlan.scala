package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator extension (tier (c) of the ladder: LogicalPlan +
  * SparkStrategy + SparkPlan, registered via SparkSessionExtensions): a
  * native sort-merge AS-OF join.
  *
  * Semantics: for every left row, attach the latest right row with
  * `rightTime <= leftTime` in the same key group (left-outer: unmatched
  * left rows null-fill the right side) — SURVEY.md B13.
  *
  * Physical shape: both children are hash-clustered on the join keys and
  * sorted within partitions by (keys, time); the exec then does a single
  * forward streaming merge per partition — O(1) state (one held right
  * row), no window buffering, no candidate-pair blowup. This is the plan
  * you want at 100 TB: one shuffle per side (elided entirely when a
  * child is already clustered, e.g. bucketed tables), then linear scans.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))

      val joined = new JoinedRow
      val rNulls = new GenericInternalRow(rOutput.size)

      new Iterator[InternalRow] {
        private var curR: InternalRow = if (rIter.hasNext) rIter.next() else null
        // latest right row already consumed, with its key (copies: the
        // underlying UnsafeRows are reused by the child iterators)
        private var heldRow: InternalRow = null
        private var heldKey: InternalRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          // consume right rows that are (a) before this key, or (b) in
          // this key at or before this time; (b) becomes the candidate
          var advancing = true
          while (advancing && curR != null) {
            val rk = rKeyProj(curR)
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0) {
              curR = if (rIter.hasNext) rIter.next() else null
            } else if (kc == 0 && timeOrd.compare(rTimeProj(curR), lt) <= 0) {
              heldRow = curR.copy()
              heldKey = rk.copy()
              curR = if (rIter.hasNext) rIter.next() else null
            } else {
              advancing = false
            }
          }
          if (heldRow != null && keyOrd.compare(heldKey, lk) == 0) {
            joined(l, heldRow)
          } else {
            joined(l, rNulls)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
