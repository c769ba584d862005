package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ECMAScript `Number::toString(x, 10)` — the implicit number→string
  * rule a JS runtime applies when a raw number is serialized (e.g. the
  * reference posts `'humidity': hum` UNformatted into a form payload,
  * `MetOffice_WOW_Connect.txt:378`, so the wire carries `String(hum)`),
  * as a native codegen'd expression.
  *
  * Neither stock Spark spelling reproduces it:
  *  - `CAST(x AS STRING)` is Java `Double.toString`: integral doubles
  *    keep a trailing ".0" (`42.0` vs JS `"42"`) and the
  *    scientific-notation switchover differs (Java at 10⁷/10⁻³ with
  *    `E`, JS at 10²¹/10⁻⁶ with `e+`/`e-`);
  *  - `format_number`/`format_string` need a fixed digit count, but JS
  *    prints the SHORTEST decimal that round-trips to the exact double
  *    (`String(0.1)` is `"0.1"`, not a 17-digit expansion).
  *
  * Algorithm (spec 6.1.6.1.20): NaN → "NaN", ±0 → "0", x<0 → "-" +
  * ToString(−x), ∞ → "Infinity"; otherwise pick the minimal k and the
  * digit string s (10^(k−1) ≤ s < 10^k) with s·10^(n−k) closest to x
  * among the decimals that convert back to exactly x, then lay the
  * digits out positionally for −6 < n ≤ 21 and in `d.ddde±x` exponent
  * form outside that window. The shortest digits are found by rounding
  * the EXACT binary expansion (`new BigDecimal(x)`) to d = 1..17
  * significant digits (HALF_EVEN = the closest d-digit decimal) and
  * keeping the first d whose result round-trips — 17 always does, so
  * the loop terminates. This matches engine output (V8 picks the
  * closest shortest representation) except in the astronomically rare
  * boundary case where the closest d-digit decimal falls exactly on a
  * neighboring double's midpoint and only a NON-closest d-digit decimal
  * round-trips — there we emit one extra digit (still value-faithful:
  * the string still reads back as exactly x).
  */
case class JsNumberString(child: Expression) extends UnaryExpression {
  override def prettyName: String = "js_number_str"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects double, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    JsNumberStringUtil.format(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.JsNumberStringUtil.format($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper called from generated code. */
object JsNumberStringUtil {
  def format(x: Double): UTF8String = UTF8String.fromString(jsToString(x))

  private[graft] def jsToString(x: Double): String = {
    if (java.lang.Double.isNaN(x)) "NaN"
    else if (x == 0.0) "0" // covers -0.0: JS String(-0) is "0"
    else if (x < 0) "-" + jsToString(-x)
    else if (java.lang.Double.isInfinite(x)) "Infinity"
    else {
      // shortest round-trip digits: round the exact binary value to d
      // significant digits (HALF_EVEN = closest) until it reads back as x
      val exact = new java.math.BigDecimal(x)
      var d = 1
      var stripped: java.math.BigDecimal = null
      while (stripped == null) {
        val r = exact.round(
          new java.math.MathContext(d, java.math.RoundingMode.HALF_EVEN))
        if (r.doubleValue() == x || d == 17) stripped = r.stripTrailingZeros()
        d += 1
      }
      val s = stripped.unscaledValue().toString
      val k = s.length
      val n = k - stripped.scale() // value = s-digits × 10^(n−k)
      if (n >= k && n <= 21) s + "0" * (n - k)
      else if (n > 0 && n <= 21) s.substring(0, n) + "." + s.substring(n)
      else if (n > -6 && n <= 0) "0." + "0" * (-n) + s
      else { // exponent form: d.ddd e ± (n−1), sign always explicit on '+'
        val mant = if (k == 1) s else s.charAt(0) + "." + s.substring(1)
        val e = n - 1
        mant + "e" + (if (e >= 0) "+" + e else e.toString)
      }
    }
  }
}
