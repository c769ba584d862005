package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ECMAScript `Number.prototype.toFixed(d)` as a native codegen'd
  * expression — the WOW wire format's number-to-string rule (reference
  * `:349-365`: tempf/dewptf `.toFixed(1)`, wind speeds `.toFixed(2)`,
  * rain/pressure `.toFixed(3)`).
  *
  * toFixed rounds the EXACT BINARY value of the double, half away from
  * zero (the spec takes |x|, then "if two n are equally near, pick the
  * larger"), which neither stock Spark spelling reproduces:
  *  - `format_number(x, d)` is DecimalFormat HALF_EVEN (and inserts
  *    thousands separators): `(0.125).toFixed(2)` = `"0.13"` but
  *    `format_number` gives `"0.12"`;
  *  - `format_string("%.2f", x)` is Java Formatter, which rounds the
  *    SHORTEST DECIMAL representation, not the binary value:
  *    `(0.615).toFixed(2)` = `"0.61"` (0.615 is really 0.61499…) but
  *    `%.2f` gives `"0.62"`.
  * `new BigDecimal(x)` is the exact binary expansion and Java HALF_UP
  * is half-away-from-zero, so `setScale(d, HALF_UP).toPlainString` is
  * bit-faithful to the spec algorithm (WeatherFunctionsSpec pins the
  * corner table against values computed by a real JS engine).
  *
  * The sign is handled BEFORE rounding, exactly as the spec does (step
  * "if x < 0, s = \"-\", x = −x"): a small negative that rounds to zero
  * keeps its sign — `(-0.04).toFixed(1)` is `"-0.0"` — which a plain
  * BigDecimal round would lose (BigDecimal has no signed zero). −0.0
  * itself formats unsigned (`"0.00…"`) because IEEE `-0.0 < 0` is false,
  * again matching the spec's test.
  *
  * For |x| ≥ 10²¹ the JS spec (step 10 vs 11) makes toFixed RETURN
  * Number::toString — exponent form — instead of positional digits, so
  * the formatter delegates to [[JsNumberStringUtil.jsToString]] there
  * (every wire field is bounded orders of magnitude below that, but the
  * function is registered session-wide as `js_to_fixed`, so it stays
  * spec-faithful for ALL finite doubles). Non-finite inputs return
  * "NaN"/"Infinity"/"-Infinity" like JS.
  */
case class JsToFixed(child: Expression, digits: Int) extends UnaryExpression {
  require(digits >= 0 && digits <= 100, "js_to_fixed: digits must be in [0, 100]")

  override def prettyName: String = "js_to_fixed"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects double, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    JsToFixedUtil.format(input.asInstanceOf[Double], digits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.JsToFixedUtil.format($c, $digits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper called from generated code. */
object JsToFixedUtil {
  def format(x: Double, d: Int): UTF8String = UTF8String.fromString {
    if (java.lang.Double.isNaN(x)) "NaN"
    else if (java.lang.Double.isInfinite(x)) { if (x > 0) "Infinity" else "-Infinity" }
    // spec step 10: |x| >= 10^21 falls back to ToString(x) exponent form
    else if (math.abs(x) >= 1e21) JsNumberStringUtil.jsToString(x)
    else {
      // spec order: strip the sign FIRST (x < 0 is false for -0.0), round
      // the magnitude, re-prepend — so "-0.0" survives where BigDecimal's
      // unsigned zero would drop it
      val neg = x < 0
      val body = new java.math.BigDecimal(if (neg) -x else x)
        .setScale(d, java.math.RoundingMode.HALF_UP).toPlainString
      if (neg) "-" + body else body
    }
  }
}
