package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each user's event stream into sessions at
  * inactivity gaps > `gapSeconds`.
  *
  * Classic two-window formulation: a boundary flag from `lag(ts)`, then a
  * running sum of boundaries as the per-user session ordinal. Both windows
  * partition by user — state is bounded by a single user's history, the
  * natural (and skew-safe, users are many) partitioning at 100 TB.
  */
object Sessionize {

  def sessions(events: DataFrame, userCol: String, tsCol: String,
               tieBreak: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreak))
    val prevMs = lag(unix_millis(col(tsCol)), 1).over(byUser)
    val boundary = when(
      prevMs.isNull || (unix_millis(col(tsCol)) - prevMs) > gapSeconds * 1000L, 1L)
      .otherwise(0L)
    events
      .withColumn("_boundary", boundary)
      .withColumn("session_id",
        sum(col("_boundary")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_boundary")
  }

  /** Per-session rollup: bounds + event count (string bounds — second
    * precision — so results compare exactly across engines).
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   tieBreak: String, gapSeconds: Long): DataFrame =
    sessions(events, userCol, tsCol, tieBreak, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_end"))
      .orderBy(col(userCol), col("session_id"))
}
