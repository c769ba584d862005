package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode => LogicalBinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** Which right row an as-of match attaches to each left row (key, t):
  *  - [[AsofDirection.Backward]] — the LAST right row with t' <= t
  *    (pandas merge_asof default; DuckDB `ON l.t >= r.t`);
  *  - [[AsofDirection.Forward]] — the FIRST right row with t' >= t;
  *  - [[AsofDirection.Nearest]] — whichever of those two is closer in
  *    time, ties to the backward match (the join_asof_near contract).
  * All three are the same one-pass merge over (key, time)-sorted sides
  * with O(1) state per partition — direction only changes which cursor
  * position matches. Nearest needs a measurable time gap, so it is
  * restricted to numeric/timestamp/date time columns (checked at
  * rewrite time by [[AsofSqlRule]] and defensively at execution). */
sealed trait AsofDirection
object AsofDirection {
  case object Backward extends AsofDirection
  case object Forward extends AsofDirection
  case object Nearest extends AsofDirection
}

/** A true merge as-of join as a custom Catalyst operator (SURVEY.md §4
  * stretch goal): for each left row (key, t), attach the right row the
  * [[AsofDirection]] selects, or nulls if none (left-asof semantics).
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
                    leftTime: Expression, rightTime: Expression,
                    direction: AsofDirection = AsofDirection.Backward)
    extends LogicalBinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, dir) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir) :: Nil
    case _ => Nil
  }
}

/** Merge as-of join: for each left row, the right row its
  * [[AsofDirection]] selects within the key group — backward = LAST
  * rightTime <= leftTime, forward = FIRST rightTime >= leftTime,
  * nearest = the closer of the two (ties backward).
  *
  * PRECONDITION: (rightKey, rightTime) should be unique on the right
  * side. With equal-time right rows, which one survives is whichever the
  * (unstable) sort emits last/first — run-dependent, like DuckDB's ASOF
  * JOIN on the same input. Callers that can see ties must reduce the
  * right side to one row per (key, time) first with an explicit keeper
  * (see join_asof_custom: max id, "last write wins"). */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        direction: AsofDirection = AsofDirection.Backward)
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

  /** leftBehind(lT, bT) <= ahead(fT, lT), exact in the type's own
    * arithmetic — the nearest tie-break. Only called with bT <= lT <= fT
    * (cursor invariants), so both gaps are mathematically non-negative.
    * For the 64-bit integer case the gap itself can still exceed
    * Long.MaxValue (a plain LongType axis spanning near-MinValue to
    * positive), where raw signed subtraction wraps negative and flips
    * the tie — but the wrapped bits are exactly the true gap mod 2⁶⁴,
    * and a true gap always fits UNSIGNED 64 bits, so compareUnsigned on
    * the raw differences is exact at any span. The narrower integer
    * types widen through Long and cannot overflow at all. */
  private def backwardWins(lT: Any, bT: Any, fT: Any): Boolean =
    leftTime.dataType match {
      case LongType | TimestampType | TimestampNTZType =>
        java.lang.Long.compareUnsigned(
          lT.asInstanceOf[Long] - bT.asInstanceOf[Long],
          fT.asInstanceOf[Long] - lT.asInstanceOf[Long]) <= 0
      case IntegerType | DateType =>
        lT.asInstanceOf[Int].toLong - bT.asInstanceOf[Int] <=
          fT.asInstanceOf[Int].toLong - lT.asInstanceOf[Int]
      case ShortType =>
        lT.asInstanceOf[Short].toLong - bT.asInstanceOf[Short] <=
          fT.asInstanceOf[Short].toLong - lT.asInstanceOf[Short]
      case ByteType =>
        lT.asInstanceOf[Byte].toLong - bT.asInstanceOf[Byte] <=
          fT.asInstanceOf[Byte].toLong - lT.asInstanceOf[Byte]
      case DoubleType =>
        lT.asInstanceOf[Double] - bT.asInstanceOf[Double] <=
          fT.asInstanceOf[Double] - lT.asInstanceOf[Double]
      case FloatType =>
        lT.asInstanceOf[Float].toDouble - bT.asInstanceOf[Float] <=
          fT.asInstanceOf[Float].toDouble - lT.asInstanceOf[Float]
      case _: DecimalType =>
        val l = lT.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
        val b = bT.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
        val f = fT.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
        l.subtract(b).compareTo(f.subtract(l)) <= 0
      case t => throw new IllegalStateException(
        s"as-of nearest needs a measurable time gap; got ${t.sql} " +
          "(the rewrite rule should have rejected this plan)")
    }

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
    val dir = direction

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // lookahead right row (NOT copied — never outlives its fetch window:
      // backward consumes it before the next fetch; forward/nearest
      // project it into the output before any further fetch)
      var rRow: InternalRow = null
      var rK: Any = null
      var rT: Any = null
      // latest right row at or before the current left time, for lastK/T
      var last: InternalRow = null
      var lastK: Any = null
      var lastT: Any = null

      def fetchRight(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next()
          rK = rKey.eval(rRow)
          rT = rTime.eval(rRow)
        } else rRow = null
      fetchRight()

      /** Consume rights strictly behind the key, plus — when `track`ing
        * the backward candidate — same-key rights with rT <= lT (copied:
        * child iterators reuse row objects). Non-tracking (forward) mode
        * consumes only same-key rights STRICTLY before lT, so an
        * equal-time right stays at the cursor as the forward match. */
      def advance(lK: Any, lT: Any, track: Boolean): Unit = {
        var advancing = true
        while (advancing && rRow != null) {
          val c = keyOrd.compare(rK, lK)
          if (c < 0) fetchRight() // right key entirely behind: discard
          else if (c == 0 &&
              (if (track) timeOrd.lteq(rT, lT) else timeOrd.lt(rT, lT))) {
            if (track) {
              last = rRow.copy()
              lastK = rKey.eval(last)
              lastT = rTime.eval(last)
            }
            fetchRight()
          } else advancing = false
        }
      }

      dir match {
        case AsofDirection.Backward => lIter.map { l =>
          val lK = lKey.eval(l)
          val lT = lTime.eval(l)
          advance(lK, lT, track = true)
          val matched = last != null && keyOrd.compare(lastK, lK) == 0
          proj(joined(l, if (matched) last else nullRight))
        }
        case AsofDirection.Forward => lIter.map { l =>
          val lK = lKey.eval(l)
          val lT = lTime.eval(l)
          advance(lK, lT, track = false)
          // loop exit: rRow is the first same-key row with rT >= lT (or a
          // later key / exhausted). Not consumed — later left rows with
          // the same key and a larger time may match it too.
          val matched = rRow != null && keyOrd.compare(rK, lK) == 0
          proj(joined(l, if (matched) rRow else nullRight))
        }
        case AsofDirection.Nearest => lIter.map { l =>
          val lK = lKey.eval(l)
          val lT = lTime.eval(l)
          advance(lK, lT, track = true)
          // backward candidate: the tracked last (rT <= lT, equality
          // included — a gap-0 match always wins the tie-break below);
          // forward candidate: the cursor row (strictly rT > lT here)
          val b = last != null && keyOrd.compare(lastK, lK) == 0
          val f = rRow != null && keyOrd.compare(rK, lK) == 0
          val pick =
            if (b && f) { if (backwardWins(lT, lastT, rT)) last else rRow }
            else if (b) last
            else if (f) rRow
            else nullRight
          proj(joined(l, pick))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
