package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.plans.{AsofJoin, AsofJoinStrategy}

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

  def join(left: DataFrame, right: DataFrame, key: String, time: String): DataFrame = {
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
      ColumnBridge.expression(left(time)), ColumnBridge.expression(r(s"r_$time")))
    ColumnBridge.ofRows(spark, plan)
  }
}
