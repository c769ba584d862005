package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** SQL-text surface for the custom merge as-of join
  * ([[AsofJoinExec]]): a pure-`spark.sql` caller writes
  *
  * {{{
  * SELECT ... FROM l LEFT JOIN r ON l.k = r.k AND asof_le(r.t, l.t)
  * }}}
  *
  * and [[AsofSqlRule]] (injected by `graft.GraftExtensions` alongside the
  * marker functions and the planner strategy) rewrites the join into the
  * [[AsofJoin]] logical node during analysis — so SQL text plans through
  * the same merge operator as the Scala `Asof.join` API: one
  * hash-partition + sort per side, O(1) state per partition, no
  * range-match blow-up.
  *
  * All three [[AsofDirection]]s have a marker:
  *  - `asof_le(r.t, l.t)` — match the LAST right row with rt <= lt
  *    (backward, the merge-asof default);
  *  - `asof_ge(r.t, l.t)` — match the FIRST right row with rt >= lt
  *    (forward);
  *  - `asof_near(r.t, l.t)` — the closer of the two, ties backward;
  *    requires a numeric/timestamp/date time column (a measurable gap).
  * The argument order is fixed for every marker (first = right-side
  * time, second = left-side time), mirroring the `r.t <= l.t` inequality
  * `asof_le` replaces.
  *
  * A marker itself is never evaluated: if it survives to execution
  * (extensions installed but the join shape outside the contract below),
  * evaluation fails with an instructive error rather than silently
  * degrading to a plain inequality left join (which would return EVERY
  * prior/following right row, not the nearest). Without the extensions
  * the function names simply do not resolve.
  *
  * Contract (checked by the rule, AnalysisException otherwise): LEFT
  * [OUTER] JOIN whose condition is exactly one equality conjunct (one
  * side's expression per input, the single as-of key — the operator's
  * own contract) AND one marker whose times are left/right-typed as
  * above. The right side should be unique per (key, time) — same
  * precondition as [[AsofJoinExec]].
  */
abstract class AsofMarker extends BinaryExpression {
  def rightTime: Expression
  def leftTime: Expression
  def direction: AsofDirection

  override def left: Expression = rightTime
  override def right: Expression = leftTime
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (rightTime.dataType == leftTime.dataType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: both time arguments must share a type, got " +
        s"${rightTime.dataType.sql} vs ${leftTime.dataType.sql}")

  private def unplanned = new IllegalStateException(
    s"$prettyName survived planning: it is only valid as the time conjunct " +
      s"of `l LEFT JOIN r ON l.k = r.k AND $prettyName(r.t, l.t)` with the " +
      s"graft.GraftExtensions asof rewrite installed ($prettyName(rightTime, " +
      "leftTime) — first argument from the right side, second from the left)")

  override protected def nullSafeEval(a: Any, b: Any): Any = throw unplanned
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    throw unplanned
}

/** Backward marker: match the LAST right row with rt <= lt. */
case class AsofLE(rightTime: Expression, leftTime: Expression)
    extends AsofMarker {
  override def prettyName: String = "asof_le"
  override def direction: AsofDirection = AsofDirection.Backward
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsofLE =
    copy(rightTime = newLeft, leftTime = newRight)
}

/** Forward marker: match the FIRST right row with rt >= lt. */
case class AsofGE(rightTime: Expression, leftTime: Expression)
    extends AsofMarker {
  override def prettyName: String = "asof_ge"
  override def direction: AsofDirection = AsofDirection.Forward
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsofGE =
    copy(rightTime = newLeft, leftTime = newRight)
}

/** Nearest marker: the closer of the backward/forward matches, ties to
  * the backward one. Needs a measurable time gap — numeric, timestamp,
  * or date (enforced here, on top of the shared same-type check). */
case class AsofNear(rightTime: Expression, leftTime: Expression)
    extends AsofMarker {
  override def prettyName: String = "asof_near"
  override def direction: AsofDirection = AsofDirection.Nearest

  override def checkInputDataTypes(): TypeCheckResult =
    super.checkInputDataTypes() match {
      case TypeCheckResult.TypeCheckSuccess => leftTime.dataType match {
        case _: NumericType | TimestampType | TimestampNTZType | DateType =>
          TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs a measurable time gap (numeric, timestamp " +
            s"or date), got ${t.sql}")
      }
      case failure => failure
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsofNear =
    copy(rightTime = newLeft, leftTime = newRight)
}

/** Analyzer rule: LEFT JOIN with an [[AsofMarker]] conjunct → [[AsofJoin]]
  * in the marker's direction. Output is schema-identical to the
  * left-outer join it replaces (left attributes + right attributes
  * nullable, same expression ids), so the rewrite is transparent to
  * everything above it. */
object AsofSqlRule extends Rule[LogicalPlan] with PredicateHelper {

  private def fail(name: String, msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3000",
      messageParameters = Map("message" -> s"$name: $msg"))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, joinType, Some(cond), _)
        if j.resolved && cond.exists(_.isInstanceOf[AsofMarker]) =>
      val (markers, rest) =
        splitConjunctivePredicates(cond).partition(_.isInstanceOf[AsofMarker])
      val m = markers match {
        case Seq(one: AsofMarker) => one
        case many => fail(many.head.asInstanceOf[AsofMarker].prettyName,
          "exactly one as-of marker conjunct is allowed, got " +
            many.map(_.asInstanceOf[AsofMarker].prettyName).mkString(", "))
      }
      val name = m.prettyName
      if (joinType != LeftOuter)
        fail(name, s"only LEFT [OUTER] JOIN supports the as-of rewrite, got $joinType")
      val eq = rest match {
        case Seq(e: EqualTo) => e
        case other => fail(name, "the join condition must be exactly one " +
          s"key equality AND one $name, got non-asof conjuncts $other")
      }
      def fromLeft(e: Expression) = e.references.subsetOf(l.outputSet)
      def fromRight(e: Expression) = e.references.subsetOf(r.outputSet)
      val (lk, rk) =
        if (fromLeft(eq.left) && fromRight(eq.right)) (eq.left, eq.right)
        else if (fromLeft(eq.right) && fromRight(eq.left)) (eq.right, eq.left)
        else fail(name, "the key equality must compare one left-side " +
          "expression with one right-side expression")
      if (!fromRight(m.rightTime) || !fromLeft(m.leftTime))
        fail(name, s"$name(rightTime, leftTime): the first argument must " +
          "be a right-side expression and the second a left-side " +
          "expression — to match in the other direction use the other " +
          "marker (asof_le backward / asof_ge forward / asof_near), not " +
          "swapped arguments")
      AsofJoin(l, r, lk, rk, m.leftTime, m.rightTime, m.direction)
  }
}
