package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.WeatherFunctions._

/** Property-based checks for the unit-conversion pack (SURVEY.md §5.3):
  * monotonicity, invertibility within float tolerance, and fixed-point
  * identities — over batched column evaluation (the operators as shipped,
  * not re-implemented scalar math). */
object ConversionProps extends Properties("conversions") {

  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private val genVals = Gen.listOfN(50, Gen.chooseNum(-1000.0, 1000.0))

  private def evalPair(vals: List[Double],
                       f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : List[(Double, Double)] =
    vals.toDF("x").select(col("x"), f(col("x")).as("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toList

  private def monotone(pairs: List[(Double, Double)]): Boolean = {
    val s = pairs.sortBy(_._1)
    s.zip(s.tail).forall { case ((_, y1), (_, y2)) => y1 <= y2 }
  }

  property("all conversions are strictly monotone") = Prop.forAll(genVals) { vals =>
    monotone(evalPair(vals, cToF)) &&
      monotone(evalPair(vals, msToMph)) &&
      monotone(evalPair(vals, mmToInch)) &&
      monotone(evalPair(vals, hpaToInHg))
  }

  property("conversions invert within 1e-9 relative") = Prop.forAll(genVals) { vals =>
    def inv(pairs: List[(Double, Double)], back: Double => Double): Boolean =
      pairs.forall { case (x, y) =>
        math.abs(back(y) - x) <= 1e-9 * math.max(1.0, math.abs(x)) }
    inv(evalPair(vals, cToF), f => (f - 32.0) / 1.8) &&
      inv(evalPair(vals, msToMph), _ / 2.236936) &&
      inv(evalPair(vals, mmToInch), _ / 0.0393701) &&
      inv(evalPair(vals, hpaToInHg), _ / 0.029529983071445)
  }

  property("dew point is strictly increasing in humidity at fixed temperature") =
    Prop.forAll(Gen.listOfN(30, Gen.zip(Gen.chooseNum(-30.0, 45.0), Gen.chooseNum(1.0, 99.0)))) { trh =>
      trh.toDF("t", "rh")
        .select((dewPointC(col("t"), col("rh") + 1.0) > dewPointC(col("t"), col("rh"))).as("ok"))
        .collect().forall(_.getBoolean(0))
    }

  // The reference's as-written 17.7 denominator (vs the textbook 17.27,
  // MetOffice_WOW_Connect.txt:191) breaks the dew<=temp invariant for cold
  // saturated air. Capability parity means reproducing that quirk exactly —
  // pin it so nobody "fixes" the constant without noticing.
  property("17.7-constant quirk: dew > temp for cold saturated air (as in the reference)") =
    Prop {
      val r = spark.range(1)
        .select(dewPointC(lit(-30.0), lit(100.0)).as("dew")).head().getDouble(0)
      r > -30.0 && r < -29.0 // ~-29.36 with 17.7; would be exactly -30 with 17.27
    }
}
