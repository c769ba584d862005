package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The reference's physical-derivation formulas as pure column expressions
  * (zero UDFs — every one of these stays inside whole-stage codegen).
  *
  * Semantics are faithfully as-written in the reference, including its
  * idiosyncrasies; citations are `MetOffice_WOW_Connect.txt:line`.
  */
object WeatherFunctions {

  /** Magnus-type dew point (°C) from temp (°C) and relative humidity (%).
    * NOTE the denominator constant is `17.7` — not the textbook `17.27` —
    * exactly as written in the reference (MetOffice_WOW_Connect.txt:190-191).
    * `log` is the natural log, matching JS `Math.log`.
    */
  def dewPointC(tC: Column, rhPct: Column): Column = {
    val gamma = lit(17.27) * tC / (lit(237.7) + tC) + log(rhPct / lit(100.0))
    lit(237.7) * gamma / (lit(17.7) - gamma)
  }

  /** ECMAScript `x.toFixed(d)` — the reference's wire-format rounding
    * (exact-binary half-away-from-zero, no thousands separators); see
    * [[graft.expressions.JsToFixed]] for why neither `format_number`
    * nor `format_string("%.Nf", …)` reproduces it. */
  def jsToFixed(c: Column, d: Int): Column =
    ColumnBridge.column(
      graft.expressions.JsToFixed(ColumnBridge.expression(c), d))

  /** ECMAScript `Number::toString` — how a RAW (unformatted) number
    * serializes when JS stringifies it, e.g. the reference's
    * `'humidity': hum` form field (`:378`); shortest round-trip digits,
    * `"42"` not `"42.0"`, JS exponent window. See
    * [[graft.expressions.JsNumberString]]. */
  def jsNumberStr(c: Column): Column =
    ColumnBridge.column(
      graft.expressions.JsNumberString(ColumnBridge.expression(c)))

  /** Wind-direction decode: 16-sector index (0=N, 1=NNE, ...) → degrees
    * string; sector 0 reports as "360" (WOW treats 0° as shifting winds) and
    * calm air (ws == 0) reports "000" (MetOffice_WOW_Connect.txt:282-290,
    * 306-307). `(winddir * 22.5).toFixed(0)` as written (`:290`) — every
    * sector degree is an exact binary multiple of 22.5, so the halves
    * (22.5, 67.5, 157.5, …) genuinely round UP like JS. */
  def windDirDeg(wd: Column, ws: Column): Column =
    when(ws === 0.0, lit("000"))
      .when(wd === 0, lit("360"))
      .otherwise(jsToFixed(wd.cast("double") * lit(22.5), 0))

  /** Numeric twin of [[windDirDeg]] for oracle-checked queries (SURVEY.md
    * §7.3 keeps string formatting out of the hash compare). */
  def windDirDegNum(wd: Column, ws: Column): Column =
    when(ws === 0.0, lit(0.0))
      .when(wd === 0, lit(360.0))
      .otherwise(wd.cast("double") * lit(22.5))

  /** WMO mast-height correction factor 1/(0.233 + 0.656·log10(h + 4.75)),
    * applied to speed and gust only when the mast is below 10 m and the air
    * is not calm (MetOffice_WOW_Connect.txt:44-46,292-305). The reference
    * computes log10 as Math.LOG10E·Math.log(x); we use log10 directly
    * (≤1 ulp difference). */
  def mastCorrectionFactor(mastHeightM: Column): Column =
    lit(1.0) / (lit(0.233) + lit(0.656) * log10(mastHeightM + lit(4.75)))

  def mastCorrected(speed: Column, ws: Column, mastHeightM: Column): Column =
    when(mastHeightM < 10.0 && ws =!= 0.0, speed * mastCorrectionFactor(mastHeightM))
      .otherwise(speed)

  /** Latitude gravity correction for the SMHI barometric reduction
    * (MetOffice_WOW_Connect.txt:66,319). */
  def latitudeCorrection(latDeg: Column): Column =
    lit(0.034163) * (lit(1.0) - lit(0.0026373) *
      cos(lit(2.0) * latDeg * lit(math.Pi) / lit(180.0)))

  /** Piecewise temperature correction, 3-way CASE
    * (MetOffice_WOW_Connect.txt:320-327). */
  def tempCorrection(tC: Column): Column =
    when(tC >= -7.0 && tC < 2.0, lit(0.535) * tC + lit(275.6))
      .when(tC < -7.0, lit(0.500) * tC + lit(275.0))
      .otherwise(lit(1.07) * tC + lit(274.5))

  /** SMHI mean-sea-level pressure reduction: site hPa × exp(alt·latCorr/
    * tempCorr) (MetOffice_WOW_Connect.txt:48-51,65,309-331). */
  def mslPressureHpa(stationHpa: Column, tC: Column, latDeg: Column, altM: Column): Column =
    stationHpa * exp(altM * latitudeCorrection(latDeg) / tempCorrection(tC))

  // Unit conversions, exact factors from MetOffice_WOW_Connect.txt:338-365.
  def cToF(c: Column): Column = c * lit(1.8) + lit(32.0)
  def msToMph(ms: Column): Column = ms * lit(2.236936)
  def mmToInch(mm: Column): Column = mm * lit(0.0393701)
  def hpaToInHg(hpa: Column): Column = hpa * lit(0.029529983071445)
}
