package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** ASOF JOIN as a first-class Catalyst operator (lectures/lecture_10.md:14)
  * — the §(c) extension path: custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered through [[GraftExtensions]].
  *
  * Semantics: for each left row, attach the LATEST right row of the same
  * key with `rightTime <= leftTime` (inclusive). `isLeftOuter` keeps
  * unmatched left rows with nulls (ASOF LEFT JOIN); otherwise they drop
  * (ASOF INNER, ClickHouse's default).
  *
  * Physical shape: both sides hash-partitioned on the key (one shuffle
  * each, inserted by EnsureRequirements from the declared distribution)
  * and sorted within partitions by (key, time); the exec then merge-scans
  * the two sorted streams per partition with O(1) carried state — no row
  * explosion at any match density, no union/null-carry columns like the
  * window formulation, and the output keeps the left side's partitioning
  * and ordering for downstream reuse.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    isLeftOuter: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, louter) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, louter) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    isLeftOuter: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // the merge preserves the left side's layout
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nRight = right.output.length
    val louter = isLeftOuter
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      // latest right row consumed whose (key, time) could still match; its
      // key is re-evaluated AFTER the copy so it doesn't alias the shuffle
      // reader's reused buffer
      var lastRight: InternalRow = null
      var lastRightKey: Any = null

      lIter.flatMap { lrow =>
        val lk = lKeyB.eval(lrow)
        val lt = lTimeB.eval(lrow)
        var matched: InternalRow = null
        if (lk != null && lt != null) {
          var continue = true
          while (continue && rBuf.hasNext) {
            val peek = rBuf.head
            val rk = rKeyB.eval(peek)
            val rt = rTimeB.eval(peek)
            if (rk == null || rt == null) { rBuf.next(); () }
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) { rBuf.next(); () } // before this key group
              else if (c == 0 && timeOrd.compare(rt, lt) <= 0) {
                lastRight = rBuf.next().copy()
                lastRightKey = rKeyB.eval(lastRight)
              } else continue = false        // beyond lt (or next key group)
            }
          }
          if (lastRight != null && keyOrd.compare(lastRightKey, lk) == 0)
            matched = lastRight
        }
        if (matched != null) Iterator.single(proj(joiner(lrow, matched)))
        else if (louter) Iterator.single(proj(joiner(lrow, nullRight)))
        else Iterator.empty
      }
    }
  }
}
