package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.operators.WeatherQueries

/** Property-based equivalence proof (SURVEY.md §5.3): the window-function
  * form of the rain logic (WeatherQueries.rainDaily) must equal a direct
  * sequential simulation of the reference state machine O8-O13
  * (MetOffice_WOW_Connect.txt:196-280) on arbitrary event sequences.
  *
  * The simulator mirrors the JS control flow literally: per-day rollover
  * reset (:229-240), daily accumulation vs Totalrainstart (:244-249),
  * rate vs Totalrainlatest with the first-rain-of-day special case
  * (:250-263), conditional write-back (:264-272), no-rain zero fill
  * (:274-280).
  */
object RainStateMachineProps extends Properties("wx_rain_daily") {

  private lazy val spark = SparkTestBase.session
  private val Freq = 4.0

  /** One simulated observation outcome. */
  private case class Obs(eventId: Long, day: String, counter: Double,
                         daily: Double, rate: Double)

  /** Sequential run of the reference state machine over one user's
    * (epochSec, value) sequence. Counter reconstruction (running sum)
    * mirrors the engine's, in the same order. */
  private def simulate(events: Seq[(Long, Double)]): Seq[Obs] = {
    var counter = BigDecimal(0)
    var historyDay: String = null     // sheet A2 (day component)
    var totalRainStart = BigDecimal(0)  // sheet B2
    var totalRainLatest = BigDecimal(0) // sheet C2; 0 = none today (:216)
    events.zipWithIndex.map { case ((epochSec, v), i) =>
      counter += BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val day = java.time.Instant.ofEpochSecond(epochSec)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      var daily = BigDecimal(0)
      var rate = BigDecimal(0)
      if (day != historyDay) {            // rollover (:229-240)
        historyDay = day
        totalRainStart = counter
        totalRainLatest = 0
      } else if (counter != totalRainStart) { // rain since day start (:244-249)
        daily = counter - totalRainStart
        rate =
          if (totalRainLatest != 0) Freq * (counter - totalRainLatest) // (:256)
          else Freq * daily                                            // (:257-263)
        if (counter != totalRainLatest) totalRainLatest = counter      // (:264-272)
      } // else: no rain today -> zeros (:274-280)
      Obs(i.toLong, day, counter.toDouble, daily.toDouble, rate.toDouble)
    }
  }

  // Event sequences: strictly increasing timestamps spanning several days,
  // non-negative increments including exact zeros (counter stall).
  private val genEvents: Gen[List[(Long, Double)]] = for {
    n <- Gen.choose(1, 40)
    gaps <- Gen.listOfN(n, Gen.choose(60L, 18L * 3600L))
    vals <- Gen.listOfN(n, Gen.oneOf(Gen.const(0.0), Gen.choose(0.01, 50.0)))
  } yield {
    val t0 = 1704067200L // 2024-01-01 00:00:00 UTC
    gaps.scanLeft(t0)(_ + _).tail.zip(vals.map(v => math.rint(v * 100) / 100))
  }

  property("window form == sequential reference state machine") =
    Prop.forAll(genEvents) { events =>
      val sim = simulate(events)
      val rows = events.zipWithIndex.map { case ((sec, v), i) =>
        (i.toLong, 1L, new Timestamp(sec * 1000L), v)
      }
      val df = spark.createDataFrame(rows)
        .toDF("event_id", "user_id", "ts", "value")
      val got = WeatherQueries.rainDaily(df)
        .orderBy("event_id")
        .collect()
        .map(r => Obs(r.getLong(0), r.getString(2), r.getDouble(3),
                      r.getDouble(4), r.getDouble(5)))
        .toSeq
      val ok = got.size == sim.size && got.zip(sim).forall { case (g, s) =>
        g.day == s.day &&
          math.abs(g.counter - s.counter) < 1e-6 &&
          math.abs(g.daily - s.daily) < 1e-6 &&
          math.abs(g.rate - s.rate) < 1e-6
      }
      if (!ok) println(s"MISMATCH\n sim=$sim\n got=$got")
      ok
    }

  property("rates and daily accumulations are non-negative") =
    Prop.forAll(genEvents) { events =>
      val rows = events.zipWithIndex.map { case ((sec, v), i) =>
        (i.toLong, 1L, new Timestamp(sec * 1000L), v)
      }
      val df = spark.createDataFrame(rows)
        .toDF("event_id", "user_id", "ts", "value")
      WeatherQueries.rainDaily(df)
        .agg(min(col("daily_rain_mm")), min(col("rain_rate_mmh")))
        .collect().forall { r => r.getDouble(0) >= 0.0 && r.getDouble(1) >= 0.0 }
    }
}
