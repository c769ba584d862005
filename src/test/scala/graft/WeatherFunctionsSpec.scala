package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WeatherFunctions._

/** Golden-value tests for the reference formulas (SURVEY.md §5.2), pinned to
  * values computed independently from the as-written JS expressions in
  * MetOffice_WOW_Connect.txt (incl. the 17.7 dew-point constant at :191). */
class WeatherFunctionsSpec extends AnyFunSuite with SparkTestBase {

  private def eval1(c: org.apache.spark.sql.Column): Double =
    spark.range(1).select(c.cast("double")).head().getDouble(0)

  private def assertNear(got: Double, want: Double, tol: Double = 1e-9): Unit =
    assert(math.abs(got - want) < tol, s"got $got want $want")

  test("dew point uses the as-written 17.7 denominator (ref :190-191)") {
    assertNear(eval1(dewPointC(lit(15.0), lit(80.0))), 11.281316140442662)
    assertNear(eval1(dewPointC(lit(-10.0), lit(95.0))), -10.398680920506731)
    assertNear(eval1(dewPointC(lit(25.0), lit(30.0))), 6.053019617706291)
  }

  test("mast correction factor (ref :292-305)") {
    assertNear(eval1(mastCorrectionFactor(lit(2.0))), 1.2869627361283407)
    assertNear(eval1(mastCorrectionFactor(lit(5.0))), 1.1340606839993135)
    assertNear(eval1(mastCorrectionFactor(lit(9.99))), 1.0004658677405809)
  }

  test("mast correction applies only below 10 m and when not calm") {
    assertNear(eval1(mastCorrected(lit(10.0), lit(10.0), lit(10.0))), 10.0) // at 10 m: none
    assertNear(eval1(mastCorrected(lit(0.0), lit(0.0), lit(5.0))), 0.0)     // calm: none
    assertNear(eval1(mastCorrected(lit(10.0), lit(10.0), lit(5.0))), 11.340606839993135)
  }

  test("wind direction decode sentinels (ref :282-290,306-307)") {
    def dir(wd: Int, ws: Double): String =
      spark.range(1).select(windDirDeg(lit(wd), lit(ws))).head().getString(0)
    assert(dir(0, 5.0) === "360")   // north reports as 360
    assert(dir(4, 5.0) === "90")    // east
    assert(dir(7, 5.0) === "158")   // 157.5 -> toFixed(0) rounds half-up
    assert(dir(3, 0.0) === "000")   // calm wins over direction
  }

  test("SMHI latitude + temperature corrections (ref :319-331)") {
    assertNear(eval1(latitudeCorrection(lit(61.8989))), 0.034213118291970754)
    // three CASE branches of the temperature correction
    assertNear(eval1(tempCorrection(lit(-10.0))), 270.0)
    assertNear(eval1(tempCorrection(lit(0.0))), 275.6)
    assertNear(eval1(tempCorrection(lit(15.0))), 290.55)
    // boundary behavior: -7 belongs to the middle branch, 2 to the upper
    assertNear(eval1(tempCorrection(lit(-7.0))), 0.535 * -7.0 + 275.6)
    assertNear(eval1(tempCorrection(lit(2.0))), 1.07 * 2.0 + 274.5)
    assertNear(eval1(mslPressureHpa(lit(1000.0), lit(15.0), lit(61.8989), lit(5.0))),
      1000.0 * 1.0005889380830755)
  }

  test("jsToFixed reproduces ECMAScript toFixed on the rounding-corner table (ref :349-365)") {
    def fx(x: Double, d: Int): String =
      spark.range(1).select(jsToFixed(lit(x), d)).head().getString(0)
    // Golden values computed with a real JS engine (node 22,
    // `x.toFixed(d)`). Three corner families, each breaking one stock
    // Spark spelling:
    // 1. exact binary halves — toFixed rounds AWAY from zero, where
    //    format_number (DecimalFormat HALF_EVEN) rounds to even:
    assert(fx(0.125, 2) === "0.13") // format_number: "0.12"
    assert(fx(2.5, 0) === "3")      // format_number: "2"
    assert(fx(3.5, 0) === "4")      // agree (4 is even) — table anchor
    assert(fx(1.25, 1) === "1.3")
    assert(fx(-1.25, 1) === "-1.3") // away from zero, also for negatives
    // 2. decimal-looking halves that are binary-below-half — toFixed
    //    rounds the EXACT binary value, where format_string %.Nf
    //    (Java Formatter) re-rounds the shortest decimal repr upward:
    assert(fx(0.615, 2) === "0.61") // %.2f: "0.62" (0.615 = 0.61499…)
    assert(fx(1.005, 2) === "1.00") // %.2f: "1.01" (1.005 = 1.00499…)
    // 3. domain values from the reference's own conversions (:349-365),
    //    computed through the as-written JS pipeline in node:
    assert(fx((12.345 * 1.8) + 32, 1) === "54.2")          // tempf
    assert(fx(4.47 * 2.236936, 2) === "10.00")             // windspeedmph
    assert(fx(3.175 * 0.0393701, 3) === "0.125")           // dailyrainin
    assert(fx(1013.25 * 0.029529983071445, 3) === "29.921") // baromin
    // edges: tiny magnitudes, signed zero, non-finite. The spec strips
    // the sign BEFORE rounding ("if x < 0, s = '-', x = -x"), so a small
    // negative that rounds to zero KEEPS its sign — while -0.0 itself is
    // unsigned because IEEE -0.0 < 0 is false:
    assert(fx(0.0005, 3) === "0.001")
    assert(fx(0.0005, 2) === "0.00")
    assert(fx(-0.0, 2) === "0.00")
    assert(fx(-0.04, 1) === "-0.0")   // node: (-0.04).toFixed(1) === "-0.0"
    assert(fx(-0.0005, 2) === "-0.00")
    assert(fx(-0.5, 0) === "-1")      // away from zero through the sign split
    assert(fx(Double.NaN, 2) === "NaN")
    // spec step 10: |x| >= 1e21 RETURNS ToString(x) — exponent form, the
    // digits argument ignored (node: (1e21).toFixed(2) === "1e+21"):
    assert(fx(1e21, 2) === "1e+21")
    assert(fx(1.23e22, 3) === "1.23e+22")
    assert(fx(-1e21, 1) === "-1e+21")
    // just BELOW the boundary, positional digits still apply
    // (node: (999999999999999900000).toFixed(1), exact binary value)
    assert(fx(9.999999999999999e20, 1) === "999999999999999868928.0")
  }

  test("jsNumberStr reproduces ECMAScript Number::toString (raw wire fields, ref :378)") {
    def ns(x: Double): String =
      spark.range(1).select(jsNumberStr(lit(x))).head().getString(0)
    // golden values from a real JS engine (node 22, String(x)) —
    // integral doubles drop the ".0" Java keeps:
    assert(ns(42.0) === "42")            // Java Double.toString: "42.0"
    assert(ns(100.0) === "100")
    assert(ns(-42.5) === "-42.5")
    // shortest round-trip digits, not the 17-digit expansion:
    assert(ns(0.1) === "0.1")
    assert(ns(1.0 / 3.0) === "0.3333333333333333")
    // the JS exponent window is (1e-6, 1e21), not Java's (1e-3, 1e7):
    assert(ns(1e7) === "10000000")       // Java: "1.0E7"
    assert(ns(1.2345678901234568e20) === "123456789012345680000")
    assert(ns(1e21) === "1e+21")
    assert(ns(1.23e22) === "1.23e+22")
    assert(ns(0.000001) === "0.000001")  // Java: "1.0E-6"
    assert(ns(0.000001234) === "0.000001234")
    assert(ns(1e-7) === "1e-7")
    assert(ns(1.5e-7) === "1.5e-7")
    assert(ns(java.lang.Double.MIN_VALUE) === "5e-324")
    assert(ns(java.lang.Double.MAX_VALUE) === "1.7976931348623157e+308")
    // zeros and non-finite: String(-0) is "0"
    assert(ns(0.0) === "0")
    assert(ns(-0.0) === "0")
    assert(ns(Double.NaN) === "NaN")
    assert(ns(Double.PositiveInfinity) === "Infinity")
    assert(ns(Double.NegativeInfinity) === "-Infinity")
  }

  test("wire record formats with the reference's toFixed decimal places (ref :349-365)") {
    val row = graft.SparkEntry.queries("wx_wow_record_wire")(spark, SF)
      .orderBy("event_id").limit(1).collect().head
    val byName = row.schema.fieldNames.zip(row.toSeq.map(String.valueOf)).toMap
    // toFixed(1) temps, (2) speeds, (3) rain/pressure — no thousands
    // separators anywhere (toFixed never inserts them); humidity is the
    // RAW number's ToString (shortest digits, so any decimal tail);
    // winddir is the windDirDeg string ("000"/"360"/toFixed(0) degrees)
    assert(byName("tempf").matches("""-?\d+\.\d"""), byName("tempf"))
    assert(byName("humidity").matches("""\d+(\.\d+)?"""), byName("humidity"))
    assert(byName("windspeedmph").matches("""\d+\.\d{2}"""), byName("windspeedmph"))
    assert(byName("dailyrainin").matches("""\d+\.\d{3}"""), byName("dailyrainin"))
    assert(byName("baromin").matches("""\d+\.\d{3}"""), byName("baromin"))
    assert(byName("winddir").matches("""\d+"""), byName("winddir"))
    assert(byName("dateutc").matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
  }

  test("barometer HTML parse round-trips the rendered pressure (ref :177-183)") {
    val df = graft.SparkEntry.queries("wx_parse_baro")(spark, SF)
    val n = df.count()
    assert(n === 1000L)
    val bad = df.filter(col("baro_parsed_hpa").isNull
      || col("baro_parsed_hpa") < 950.0 || col("baro_parsed_hpa") >= 1050.1).count()
    assert(bad === 0L, s"$bad rows failed to parse back into the valid range")
  }

  test("unit conversions use the exact reference factors (ref :338-365)") {
    assertNear(eval1(cToF(lit(100.0))), 212.0)
    assertNear(eval1(msToMph(lit(10.0))), 22.36936)
    assertNear(eval1(mmToInch(lit(25.4))), 1.0000005399999998)
    assertNear(eval1(hpaToInHg(lit(1013.25))), 29.921255347141646)
  }
}
