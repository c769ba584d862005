package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode => LogicalBinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A true merge as-of join as a custom Catalyst operator (SURVEY.md §4
  * stretch goal): for each left row (key, t), attach the right row with the
  * same key and the greatest t' <= t, or nulls if none (left-asof
  * semantics).
  *
  * Why a custom operator: the composable spellings (union+window, or
  * range-join + row_number) either widen the left rows through a window
  * shuffle carrying both schemas, or materialize the full range-match
  * blow-up before pruning to the latest match. The merge form does one
  * hash-partition + sort per side (exactly a sort-merge join's cost) and
  * then streams both sorted iterators with O(1) state per partition — no
  * intermediate blow-up, no second shuffle. This is the 100 TB shape.
  *
  * Plan wiring: logical node -> strategy -> BinaryExecNode whose
  * requiredChildDistribution/Ordering make EnsureRequirements insert the
  * exchanges and sorts — the operator itself never repartitions.
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression)
    extends LogicalBinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Merge as-of join: for each left row, the LAST right row with
  * rightTime <= leftTime within the key group.
  *
  * PRECONDITION: (rightKey, rightTime) should be unique on the right
  * side. With equal-time right rows, "last" is whichever the (unstable)
  * sort emits last — run-dependent, like DuckDB's ASOF JOIN on the same
  * input. Callers that can see ties must reduce the right side to one
  * row per (key, time) first with an explicit keeper (see
  * join_asof_custom: max id, "last write wins"). */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Both sides hash-clustered on the key: EnsureRequirements inserts
    * compatible exchanges (same mechanism as SortMergeJoin). */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  /** Both sides sorted by (key, time): the merge needs only a cursor. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // lookahead right row (NOT copied — consumed before the next fetch)
      var rRow: InternalRow = null
      var rK: Any = null
      var rT: Any = null
      // latest right row at or before the current left time, for lastK
      var last: InternalRow = null
      var lastK: Any = null

      def fetchRight(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next()
          rK = rKey.eval(rRow)
          rT = rTime.eval(rRow)
        } else rRow = null
      fetchRight()

      lIter.map { l =>
        val lK = lKey.eval(l)
        val lT = lTime.eval(l)
        // advance the right cursor up to (key, time) <= (lK, lT)
        var advancing = true
        while (advancing && rRow != null) {
          val c = keyOrd.compare(rK, lK)
          if (c < 0) fetchRight() // right key entirely behind: discard
          else if (c == 0 && timeOrd.lteq(rT, lT)) {
            last = rRow.copy()    // rows are reused by the child iterator
            lastK = rKey.eval(last)
            fetchRight()
          } else advancing = false
        }
        val matched = last != null && keyOrd.compare(lastK, lK) == 0
        proj(joined(l, if (matched) last else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
