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

  /** Integer-exact exponential moving average per key — the
    * inter-arrival-smoothing feature behind per-user activity baselines
    * and anomaly scores: `s_1 = v_1`, `s_t = (num·v_t + (den−num)·s_{t−1})
    * div den` over the key's `(ts, tiebreak)`-ordered events, in integral
    * units with TRUNCATING division (the [[graft.operators.Graph]] /
    * stableAvg fixed-point discipline, so the trajectory replays exactly
    * in any engine — a DuckDB recursive CTE grades every step).
    *
    * Why typed `flatMapGroups` and not a window: [[sessions]]' recurrence
    * is a running SUM (window-expressible); the EWMA recurrence with
    * integer division is not expressible as any Spark window aggregate —
    * each state depends non-linearly on the previous. This is exactly the
    * per-key ordered-scan case the brief's escape-hatch ordering reserves
    * typed groups for. One exchange on the key, per-key sort in task
    * memory — state bounded by a single key's history (the sessionize
    * bound); for unbounded histories, process time-chunks with the final
    * state carried, or the streaming
    * [[graft.streaming.Streams.asofEnrich]]-style keyed state.
    */
  def ewmaFixedPoint(events: DataFrame, userCol: String, tsCol: String,
                     tieBreak: String, valueCol: String,
                     alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"ewmaFixedPoint: alpha must be in (0,1), got $alphaNum/$alphaDen")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(userCol).cast("long"), unix_micros(col(tsCol)),
        col(tieBreak).cast("long"), col(valueCol).cast("long"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        var s = 0L
        var first = true
        evs.iterator.map { e =>
          s = if (first) { first = false; e._4 }
          else (alphaNum * e._4 + (alphaDen - alphaNum) * s) / alphaDen
          (k, e._3, e._4, s)
        }
      }
      .toDF(userCol, tieBreak, "value_units", "ewma_units")
  }
}
