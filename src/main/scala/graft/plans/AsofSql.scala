package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType}

/** SQL-text surface for the custom merge as-of join
  * ([[AsofJoinExec]]): a pure-`spark.sql` caller writes
  *
  * {{{
  * SELECT ... FROM l LEFT JOIN r ON l.k = r.k AND asof_le(r.t, l.t)
  * }}}
  *
  * and [[AsofSqlRule]] (injected by `graft.GraftExtensions` alongside the
  * `asof_le` function and the planner strategy) rewrites the join into the
  * [[AsofJoin]] logical node during analysis — so SQL text plans through
  * the same merge operator as the Scala `Asof.join` API: one
  * hash-partition + sort per side, O(1) state per partition, no
  * range-match blow-up.
  *
  * `asof_le(rt, lt)` marks the time conjunct "match the LAST right row
  * with rt <= lt"; the argument order is fixed (first = right-side time,
  * second = left-side time), mirroring the `r.t <= l.t` inequality it
  * replaces. The marker itself is never evaluated: if it survives to
  * execution (extensions installed but the join shape outside the
  * contract below), evaluation fails with an instructive error rather
  * than silently degrading to a plain `<=` left join (which would
  * return EVERY prior right row, not the latest). Without the
  * extensions the function name simply does not resolve.
  *
  * Contract (checked by the rule, AnalysisException otherwise): LEFT
  * [OUTER] JOIN whose condition is exactly one equality conjunct (one
  * side's expression per input, the single as-of key — the operator's
  * own contract) AND one `asof_le` whose times are left/right-typed as
  * above. The right side should be unique per (key, time) — same
  * precondition as [[AsofJoinExec]].
  */
case class AsofLE(rightTime: Expression, leftTime: Expression)
    extends BinaryExpression {
  override def left: Expression = rightTime
  override def right: Expression = leftTime
  override def dataType: DataType = BooleanType
  override def prettyName: String = "asof_le"

  override def checkInputDataTypes(): TypeCheckResult =
    if (rightTime.dataType == leftTime.dataType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: both time arguments must share a type, got " +
        s"${rightTime.dataType.sql} vs ${leftTime.dataType.sql}")

  private def unplanned = new IllegalStateException(
    "asof_le survived planning: it is only valid as the time conjunct of " +
      "`l LEFT JOIN r ON l.k = r.k AND asof_le(r.t, l.t)` with the " +
      "graft.GraftExtensions asof rewrite installed (asof_le(rightTime, " +
      "leftTime) — first argument from the right side, second from the left)")

  override protected def nullSafeEval(a: Any, b: Any): Any = throw unplanned
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    throw unplanned

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsofLE =
    copy(rightTime = newLeft, leftTime = newRight)
}

/** Analyzer rule: LEFT JOIN with an [[AsofLE]] conjunct → [[AsofJoin]].
  * Output is schema-identical to the left-outer join it replaces (left
  * attributes + right attributes nullable, same expression ids), so the
  * rewrite is transparent to everything above it. */
object AsofSqlRule extends Rule[LogicalPlan] with PredicateHelper {

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3000",
      messageParameters = Map("message" -> s"asof_le: $msg"))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, joinType, Some(cond), _)
        if j.resolved && cond.exists(_.isInstanceOf[AsofLE]) =>
      if (joinType != LeftOuter)
        fail(s"only LEFT [OUTER] JOIN supports the as-of rewrite, got $joinType")
      val (markers, rest) =
        splitConjunctivePredicates(cond).partition(_.isInstanceOf[AsofLE])
      val eq = rest match {
        case Seq(e: EqualTo) => e
        case other => fail("the join condition must be exactly one key " +
          s"equality AND one asof_le, got non-asof conjuncts $other")
      }
      val AsofLE(rt, lt) = markers match {
        case Seq(m: AsofLE) => m
        case _ => fail("exactly one asof_le conjunct is allowed")
      }
      def fromLeft(e: Expression) = e.references.subsetOf(l.outputSet)
      def fromRight(e: Expression) = e.references.subsetOf(r.outputSet)
      val (lk, rk) =
        if (fromLeft(eq.left) && fromRight(eq.right)) (eq.left, eq.right)
        else if (fromLeft(eq.right) && fromRight(eq.left)) (eq.right, eq.left)
        else fail("the key equality must compare one left-side expression " +
          "with one right-side expression")
      if (!fromRight(rt) || !fromLeft(lt))
        fail("asof_le(rightTime, leftTime): the first argument must be a " +
          "right-side expression and the second a left-side expression " +
          "(forward/nearest as-of variants are not SQL-surfaced)")
      AsofJoin(l, r, lk, rk, lt, rt)
  }
}
