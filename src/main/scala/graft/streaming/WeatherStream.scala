package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface of the engine (SURVEY.md §2A O8-O13, O23;
  * §7.1 step 7): the reference is a 15-minute-trigger micro-batch pipeline
  * whose only cross-run state is the rain-history sheet. Here that state
  * lives in Spark's state store via flatMapGroupsWithState, keyed by
  * sensor/user — the direct Spark analogue of the Google-Sheet row
  * (MetOffice_WOW_Connect.txt:210-272).
  *
  * Scale notes: state is O(1) per key (four scalars), the state store
  * shuffles once on user_id, and watermarking bounds both state retention
  * and late-data acceptance (generalizing the reference's staleness guard
  * at :244). The windowed aggregations reuse the exact operators the batch
  * path uses (`window`, `session_window`), so batch and streaming results
  * are directly comparable — which StreamingSpec exploits.
  */
object WeatherStream {

  final case class SensorReading(event_id: Long, user_id: Long, ts: Timestamp, value: Double)

  /** The rain-history state row (FIXTURES.md A3): day + the two counter
    * snapshots; `counter` is the reconstructed monotone gauge register.
    *
    * Counters are BigDecimal, accumulated with exactly the batch path's
    * DECIMAL(25,6) cast semantics (see [[dec6]]) — so the streaming output
    * is BIT-IDENTICAL to `WeatherQueries.rainDaily`, and the registered
    * `wx_rain_daily_stream` query shares the batch oracle SQL (a
    * double-accumulating state would drift in the last ulp over a long
    * stream and hash-mismatch). */
  final case class RainState(day: String, totalRainStart: BigDecimal,
                             totalRainLatest: BigDecimal, counter: BigDecimal)

  final case class RainObs(event_id: Long, user_id: Long, ts: Timestamp,
                           value: Double, day: String,
                           total_rain_mm: Double, daily_rain_mm: Double,
                           rain_rate_mmh: Double)

  private val ObsFreq = 4.0 // 15-min cadence (MetOffice_WOW_Connect.txt:34-39)

  private def dayOf(ts: Timestamp): String =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  /** The reading as the batch path sees it: Spark's `cast(value AS
    * DECIMAL(25,6))` (HALF_UP via Decimal.changePrecision) — one code path
    * for the rounding rule on both engines' inputs. */
  private def dec6(v: Double): BigDecimal = {
    val d = org.apache.spark.sql.types.Decimal(v)
    if (!d.changePrecision(25, 6))
      throw new ArithmeticException(s"value $v overflows DECIMAL(25,6)")
    d.toBigDecimal
  }

  private val Zero = BigDecimal(0)

  /** The reference state machine O8-O13, one micro-batch group at a time.
    * Rows are sorted within the batch (the store guarantees nothing about
    * iterator order); state carries across batches exactly like the
    * reference's sheet carries across runs.
    *
    * PRECONDITION: `value` >= 0 (a rain gauge's increments — the
    * reference's register is monotone non-negative). The
    * `totalRainLatest != 0` guard mirrors the reference's sheet cell
    * semantics (:257-263), where 0 doubles as "no rain written today";
    * a counter that could legitimately REACH zero mid-day (only possible
    * with negative increments) would alias that sentinel and diverge
    * from the batch window spelling. */
  private[streaming] def updateRain(
      userId: Long, rows: Iterator[SensorReading],
      state: GroupState[RainState]): Iterator[RainObs] = {
    val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
    var st = state.getOption.getOrElse(RainState(null, Zero, Zero, Zero))
    val out = sorted.map { r =>
      val counter = st.counter + dec6(r.value)
      val day = dayOf(r.ts)
      var daily = Zero
      var rate = 0.0
      if (day != st.day) {                       // rollover (:229-240)
        st = RainState(day, counter, Zero, counter)
      } else {
        st = st.copy(counter = counter)
        if (counter != st.totalRainStart) {      // rain since day start (:244-249)
          daily = counter - st.totalRainStart
          // double math mirrors the batch spelling (decimal diff -> double,
          // then * ObsFreq), so the emitted rate is bit-identical
          rate =
            if (st.totalRainLatest != Zero) (counter - st.totalRainLatest).toDouble * ObsFreq
            else daily.toDouble * ObsFreq        // first rain of day (:257-263)
          if (counter != st.totalRainLatest)     // conditional write-back (:264-272)
            st = st.copy(totalRainLatest = counter)
        }
      }
      RainObs(r.event_id, userId, r.ts, r.value, day, counter.toDouble, daily.toDouble, rate)
    }
    state.update(st)
    out.iterator
  }

  /** Streaming rain pipeline: per-user stateful accumulation. Input is a
    * (possibly unbounded) stream of readings; output one RainObs per
    * reading, exactly the batch `WeatherQueries.rainDaily` semantics. */
  def rainDailyStream(readings: Dataset[SensorReading]): Dataset[RainObs] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RainState, RainObs](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateRain)
  }

  /** Write `readings` (event_id, user_id, ts, value) as `nChunks`
    * event-time-range parquet files under `dir` and return the file-source
    * stream that replays them oldest-first, ONE chunk per micro-batch
    * (maxFilesPerTrigger=1; per-chunk modification times pin the replay
    * order — the file source drains ascending modtime). Range-splitting on
    * event time means replay order == event-time order across batches,
    * while [[updateRain]] sorts within each batch; nothing is collected to
    * the driver beyond the nChunks-1 quantile boundaries. Production swaps
    * the staging dir for a landing directory and runs unbounded. */
  def chunkedFileFeed(readings: DataFrame, dir: String,
                      nChunks: Int = 4): Dataset[SensorReading] =
    chunkedFileFeedDF(readings, "ts", dir, nChunks)
      .as[SensorReading](org.apache.spark.sql.Encoders.product[SensorReading])

  /** Untyped core of [[chunkedFileFeed]]: schema-preserving, splits on
    * `tsCol`. Works for any event-time DataFrame (the tumbling-window
    * streaming query uses it over (ts, event_type, value)).
    *
    * Degenerate event-time distributions (a value spanning a quantile
    * boundary) collapse adjacent chunks: duplicate bounds are
    * deduplicated, so the feed degrades to fewer (still correctly
    * ordered) micro-batches instead of writing empty chunk ranges. */
  def chunkedFileFeedDF(readings: DataFrame, tsCol: String, dir: String,
                        nChunks: Int = 4): DataFrame = {
    val s = readings.sparkSession
    val probs = (1 until nChunks).map(_.toDouble / nChunks).toArray
    val bounds = readings.select(col(tsCol).cast("double").as("t"))
      .stat.approxQuantile("t", probs, 0.0)
      .distinct
    val chunk = bounds.zipWithIndex.foldRight(lit(bounds.length): Column) {
      case ((b, k), rest) => when(col(tsCol).cast("double") <= b, k).otherwise(rest)
    }
    readings.withColumn("chunk", chunk)
      .repartition(bounds.length + 1, col("chunk"))
      .write.partitionBy("chunk").mode("overwrite").parquet(dir)
    val t0 = new java.io.File(dir).lastModified()
    for (k <- 0 to bounds.length) {
      val d = new java.io.File(dir, s"chunk=$k")
      Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
        // replay order (ascending modtime in FileStreamSource) is a
        // CORRECTNESS dependency of the stateful consumers — a filesystem
        // that cannot pin mtimes must fail loudly, not reorder silently
        require(f.setLastModified(t0 + k * 60000L),
          s"cannot set modification time on $f; chunk replay order would be undefined")
      }
    }
    s.readStream
      .schema(readings.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/chunk=*")
  }

  /** Run an append-mode streaming frame to completion through a PARQUET
    * file sink and read the committed result back — the scale-correct
    * harness drain for streams whose output is O(input): rows land on
    * (distributed at scale) storage straight from the executors, and the
    * driver never materializes the result — unlike a memory sink, whose
    * table lives in driver memory and caps output size at driver heap.
    * Sink + checkpoint dirs are deterministic per query name and wiped
    * before each run (Bench drives a query up to 3 times per session; a
    * parquet sink cannot be re-driven from a stale checkpoint against a
    * reset input feed, and a fresh-dir-per-run scheme would leak an
    * output copy per invocation). */
  def drainToParquet(df: DataFrame, name: String): DataFrame = {
    val s = df.sparkSession
    val base = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sink_$name")
    def wipe(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
      f.delete(); ()
    }
    wipe(base)
    val q = df.writeStream.format("parquet")
      .option("path", new java.io.File(base, "out").getAbsolutePath)
      .option("checkpointLocation", new java.io.File(base, "ckpt").getAbsolutePath)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(new java.io.File(base, "out").getAbsolutePath)
  }

  /** One staging directory per feed name under java.io.tmpdir, REUSED
    * across invocations (overwrite-mode writes reset it): Bench/Verify
    * invoke each streaming query several times per session, and a fresh
    * temp dir per run would leak a full table copy each time. */
  def stagingDir(name: String, sfDir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_feed_${name}_${Integer.toHexString(sfDir.hashCode)}").getAbsolutePath

  /** Event-time tumbling aggregation with a watermark: late rows beyond
    * `lateness` are dropped — the generalized form of the reference's
    * stale-measurement guard (:244). */
  def hourlyStats(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup with bounded state: duplicate keys arriving
    * within the watermark horizon are dropped, and per-key state is
    * evicted once the watermark passes — O(distinct keys in horizon)
    * state, the only dedup shape that survives an unbounded stream. */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  lateness: String = "2 hours"): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(keys)

  /** Gap-based session aggregation (30 min) with watermark. */
  def sessionStats(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
              col("n"), col("sum_value"))
}
