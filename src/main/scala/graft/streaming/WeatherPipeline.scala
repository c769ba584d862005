package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.WeatherQueries
import graft.streaming.WeatherStream.SensorReading

/** The complete streaming port of `MetOffice_WOW_Connect()` — the
  * reference program as one Structured Streaming job (SURVEY.md §3
  * lifecycle mapping):
  *
  *   readings stream  ──► sensor channels (stateless column math)
  *                    ──► stateful rain machine (flatMapGroupsWithState)
  *                    ──► D4 12-field observation record (shared batch
  *                         projection — byte-identical to wx_wow_record)
  *                    ──► WowSink (per-partition transport, reference
  *                         error semantics)
  *
  * triggered every 15 minutes by default (observ_exec_freq = 4,
  * MetOffice_WOW_Connect.txt:34-39 — O23).
  */
object WeatherPipeline {

  /** Streaming observation records: same columns, same values as the batch
    * flagship on identical input (proven in WeatherPipelineSpec). */
  def observationRecords(readings: Dataset[SensorReading]): DataFrame = {
    val rain = WeatherStream.rainDailyStream(readings).toDF()
      .withColumnRenamed("daily_rain_mm", "dailyrain_mm")
      .withColumnRenamed("rain_rate_mmh", "rain_mmh")
    WeatherQueries.wowProjection(WeatherQueries.sensors(rain))
  }

  /** Launch the full pipeline against a transport — the sink (and its
    * O22 at-most-once error semantics) is WowSink.start, one spelling for
    * both the standalone sink and the composed pipeline. */
  def start(readings: Dataset[SensorReading], transport: WowSink.Transport,
            trigger: Trigger = Trigger.ProcessingTime("15 minutes"),
            queryName: String = "wow_pipeline"): StreamingQuery =
    WowSink.start(observationRecords(readings), transport, queryName, Some(trigger))
}
