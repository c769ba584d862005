package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.plans.{AsofDirection, AsofJoin, AsofJoinStrategy}

/** Public API for the custom merge as-of join (graft.plans.AsofJoinPlan).
  *
  * `Asof.join(trades, quotes, "symbol", "ts")` attaches to every left row
  * the latest right row with the same key and right.time <= left.time
  * (nulls when none). Right-side columns come back prefixed `r_` so
  * self-joins and name collisions are safe.
  *
  * Left/right rows with null key or time must be filtered by the caller
  * (as-of on a null axis is meaningless); both time columns must share a
  * data type, typically timestamp.
  */
object Asof {

  /** As-of join with a match-window bound (pandas merge_asof `tolerance`):
    * matches older than `tolerance` behind the left time are nulled out.
    * Applied as a post-projection over the merge result — the merge cost
    * is identical, only acceptance changes. */
  def joinWithTolerance(left: DataFrame, right: DataFrame, key: String,
                        time: String, tolerance: org.apache.spark.sql.Column): DataFrame = {
    val joined = join(left, right, key, time)
    val keep = col(s"r_$time") >= col(time) - tolerance
    val rightCols = right.columns.map(c =>
      when(keep, col(s"r_$c")).as(s"r_$c"))
    joined.select(left.columns.map(col) ++ rightCols: _*)
  }

  def join(left: DataFrame, right: DataFrame, key: String, time: String): DataFrame =
    joinDir(left, right, key, time, AsofDirection.Backward)

  /** Forward as-of: the FIRST right row with r.time >= left.time (pandas
    * direction='forward'). Same merge cost as [[join]]. */
  def joinForward(left: DataFrame, right: DataFrame, key: String, time: String): DataFrame =
    joinDir(left, right, key, time, AsofDirection.Forward)

  /** Nearest as-of: the closer of the backward/forward matches, ties to
    * the backward one (pandas direction='nearest', the join_asof_near
    * tie rule). Time must be numeric/timestamp/date (a measurable gap) —
    * validated HERE, mirroring [[graft.plans.AsofNear]]'s SQL-side
    * checkInputDataTypes: this Scala path never goes through the SQL
    * rewrite rule, so without the upfront check a string time column
    * only failed deep inside execution with a message blaming the
    * rewrite rule. Same merge cost as [[join]] — both candidates come
    * from the one sorted cursor pass. */
  def joinNearest(left: DataFrame, right: DataFrame, key: String, time: String): DataFrame = {
    import org.apache.spark.sql.types._
    left.schema(time).dataType match {
      case _: NumericType | TimestampType | TimestampNTZType | DateType => ()
      case t => throw new IllegalArgumentException(
        s"Asof.joinNearest needs a measurable time gap (numeric, timestamp " +
          s"or date) on '$time', got ${t.sql}")
    }
    joinDir(left, right, key, time, AsofDirection.Nearest)
  }

  private def joinDir(left: DataFrame, right: DataFrame, key: String,
                      time: String, dir: AsofDirection): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
    // fresh aliases => fresh expression ids => self-join safe
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")): _*)
    val plan = AsofJoin(
      ColumnBridge.analyzed(left), ColumnBridge.analyzed(r),
      ColumnBridge.expression(left(key)), ColumnBridge.expression(r(s"r_$key")),
      ColumnBridge.expression(left(time)), ColumnBridge.expression(r(s"r_$time")),
      dir)
    ColumnBridge.ofRows(spark, plan)
  }
}
