package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WeatherQueries
import graft.streaming.{WeatherPipeline, WowSink}
import graft.streaming.WeatherStream.SensorReading

/** End-to-end proof that the streaming port of the reference program emits
  * records identical to the batch flagship on the same inputs, all the way
  * through the sink transport. */
class WeatherPipelineSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-02-01 00:05:00").getTime

  private val readings = (0 until 60).map { i =>
    SensorReading(i.toLong, i.toLong % 4,
      new Timestamp(t0 + i * 47L * 60L * 1000L), // 47-min cadence, crosses days
      (i * 37 % 400) / 4.0 + 0.25)
  }

  test("streaming pipeline records == batch flagship records, through the sink") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    WowSink.BufferTransport.clear()
    val input = MemoryStream[SensorReading]
    val q = WeatherPipeline.start(input.toDS(), WowSink.BufferTransport(),
      trigger = Trigger.ProcessingTime(0), queryName = "wow_e2e")
    try {
      val (a, b) = readings.splitAt(37)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val sentJson = WowSink.BufferTransport.sent.asScala.toSeq
    assert(sentJson.size === readings.size)

    val streamed = spark.read.json(spark.createDataset(sentJson))
    val batch = WeatherQueries.wowRecordFrom(
      readings.toDF("event_id", "user_id", "ts", "value"))

    assert(streamed.columns.sorted.toSeq === batch.columns.sorted.toSeq)
    // identical rows, compared column-by-column after alignment on event_id
    val cols = batch.columns.toSeq
    val b2 = batch.orderBy("event_id").collect().map(_.toSeq).toSeq
    val s2 = streamed.select(cols.head, cols.tail: _*)
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(s2.size === b2.size)
    s2.zip(b2).foreach { case (sr, br) =>
      cols.indices.foreach { i =>
        (sr(i), br(i)) match {
          case (a: Double, b: Double) =>
            assert(math.abs(a - b) < 1e-9, s"col ${cols(i)}: $a vs $b")
          case (a, b) =>
            assert(String.valueOf(a) === String.valueOf(b), s"col ${cols(i)}: $a vs $b")
        }
      }
    }
  }
}
