package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed scale-first from the
  * operators it has (preference order: composition before custom plans).
  *
  * - [[asofJoin]]: point-in-time join — each probe row picks up the latest
  *   dimension state at-or-before its timestamp (the feature-store join a
  *   training pipeline runs to avoid label leakage).
  * - [[rangeJoin]]: interval-containment join via time bucketing — never a
  *   nested-loop/cartesian plan.
  */
object Temporal {

  /** As-of (point-in-time) join. For every probe row, attach `valueCols`
    * from the `dim` row with the greatest `ts` ≤ the probe's `ts` (same
    * `key`; inclusive; nulls if no dim row precedes the probe).
    *
    * Single-shuffle formulation: union the tagged relations, one window
    * per key ordered by (ts, dim-first), carry the dim payload forward
    * with `last(ignoreNulls)`, keep probe rows. Equivalent to DuckDB's
    * `ASOF JOIN`. `dim` must be unique per (key, ts) — pre-aggregate
    * otherwise (standard as-of precondition).
    *
    * Scale: ONE exchange on `key` for both inputs and a per-key sort —
    * same cost class as the sort-merge join Spark would need anyway; never
    * a per-row subquery or a range cross product. The payload rides as one
    * struct so window state is a single value regardless of column count.
    */
  def asofJoin(probe: DataFrame, dim: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    // the internal tag/payload columns and the attached valueCols must not
    // collide with probe columns — a silent collision yields ambiguous or
    // wrong output, so fail fast with the offending names
    val reserved = Seq("_dim_payload", "_is_dim", "_asof")
    val clashes = probe.columns.filter(c => reserved.contains(c) || valueCols.contains(c))
    require(clashes.isEmpty,
      s"asofJoin: probe columns collide with reserved/value columns: ${clashes.mkString(", ")}")
    val dimTagged = dim.select(
      col(key), col(ts),
      struct(valueCols.map(col): _*).as("_dim_payload"),
      lit(1).as("_is_dim"))
    val probeTagged = probe.withColumn("_is_dim", lit(0))
    val unioned = probeTagged.unionByName(dimTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_is_dim").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_asof", last(col("_dim_payload"), ignoreNulls = true).over(w))
    carried
      .filter(col("_is_dim") === 0)
      .select(probe.columns.map(col) ++
        valueCols.map(c => col("_asof").getField(c).as(c)): _*)
  }

  /** Directional as-of join — the full pandas `merge_asof` surface over
    * the same single-shuffle union/window formulation as [[asofJoin]]:
    *
    *  - `backward`: greatest dim `ts` ≤ probe's (== [[asofJoin]])
    *  - `forward`:  smallest dim `ts` ≥ probe's
    *  - `nearest`:  whichever of the two is closer in time; an exact tie
    *    takes the backward match (pandas' rule)
    *
    * The dim timestamp rides inside the payload struct so `nearest` can
    * compare distances without a second join. Both window passes share
    * the ONE exchange on `key` (same partitioning, two sorted frames).
    * Inclusive on both sides, like pandas with `allow_exact_matches`.
    */
  def asofJoinDirectional(probe: DataFrame, dim: DataFrame, key: String,
                          ts: String, valueCols: Seq[String],
                          direction: String): DataFrame = {
    val reserved = Seq("_dim_payload", "_back", "_fwd", "_is_dim", "_dim_ts", "_pick")
    val clashes = probe.columns.filter(c => reserved.contains(c) || valueCols.contains(c)) ++
      valueCols.filter(reserved.contains) // a valueCol named _dim_ts would duplicate a struct field
    require(clashes.isEmpty,
      s"asofJoinDirectional: probe columns collide: ${clashes.distinct.mkString(", ")}")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asofJoinDirectional: unknown direction '$direction'")
    val dimTagged = dim.select(
      col(key), col(ts),
      struct((valueCols.map(col) :+ col(ts).as("_dim_ts")): _*).as("_dim_payload"),
      lit(1).as("_is_dim"))
    val probeTagged = probe.withColumn("_is_dim", lit(0))
    val unioned = probeTagged.unionByName(dimTagged, allowMissingColumns = true)
    // backward: dims sort BEFORE probes at equal ts so the inclusive
    // preceding frame sees them; forward mirrors with the following frame
    // (dims after probes at equal ts remain inside it)
    val wBack = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_is_dim").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_is_dim").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val both = unioned
      .withColumn("_back", last(col("_dim_payload"), ignoreNulls = true).over(wBack))
      .withColumn("_fwd", first(col("_dim_payload"), ignoreNulls = true).over(wFwd))
      .filter(col("_is_dim") === 0)
    val pick = direction match {
      case "backward" => col("_back")
      case "forward"  => col("_fwd")
      case "nearest"  =>
        val dBack = unix_micros(col(ts)) - unix_micros(col("_back").getField("_dim_ts"))
        val dFwd = unix_micros(col("_fwd").getField("_dim_ts")) - unix_micros(col(ts))
        when(col("_back").isNull, col("_fwd"))
          .when(col("_fwd").isNull, col("_back"))
          .when(dBack <= dFwd, col("_back"))
          .otherwise(col("_fwd"))
    }
    both.withColumn("_pick", pick)
      .select(probe.columns.map(col) ++
        valueCols.map(c => col("_pick").getField(c).as(c)): _*)
  }

  /** Interval-containment join: every (`points` row, `intervals` row) pair
    * with matching `key` and `lo ≤ ts ≤ hi`.
    *
    * Plan shape: both sides bucket into `binSeconds` time bins — an
    * interval replicates into each bin it spans, a point lands in exactly
    * one — so the join is a plain equi-join on (key, bin) plus the exact
    * range filter. No duplicates (a point matches an interval only in the
    * point's own bin) and no nested-loop join. Replication factor is
    * span/binSeconds: pick the bin near the median interval length.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                ts: String, lo: String, hi: String, binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val pBin = points.withColumn("_bin", floor(unix_timestamp(col(ts)) / binSeconds))
    val iBin = intervals.withColumn("_bin",
      explode(sequence(
        floor(unix_timestamp(col(lo)) / binSeconds),
        floor(unix_timestamp(col(hi)) / binSeconds))))
    pBin.join(iBin, Seq(key, "_bin"))
      .filter(col(ts) >= col(lo) && col(ts) <= col(hi))
      .drop("_bin")
  }

  /** Interval-interval OVERLAP join — the two-sided completion of
    * [[rangeJoin]] (point-in-interval): pairs of intervals on the same key
    * that overlap (inclusive bounds), e.g. sessions × incident windows,
    * ad flights × attribution windows. Same time-binning strategy — both
    * sides explode into the bins they touch and equi-join on
    * `(key, bin)` — so the plan is a hash join, never a nested loop.
    *
    * Each overlapping pair is emitted EXACTLY ONCE without a distinct
    * pass: a pair sharing many bins matches only in its canonical bin,
    * the one containing the overlap's start (`max(lo_a, lo_b)`) — the
    * dedup is a filter, not a shuffle. Bin width trades fan-out for join
    * selectivity exactly as in [[rangeJoin]]: set it near the typical
    * interval length.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, key: String,
                  lLo: String, lHi: String, rLo: String, rHi: String,
                  binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    def bins(lo: String, hi: String) =
      explode(sequence(
        floor(unix_timestamp(col(lo)) / binSeconds),
        floor(unix_timestamp(col(hi)) / binSeconds)))
    val lB = left.withColumn("_bin", bins(lLo, lHi))
    val rB = right.withColumn("_bin", bins(rLo, rHi))
    lB.join(rB, Seq(key, "_bin"))
      .filter(col(rLo) <= col(lHi) && col(lLo) <= col(rHi))
      .filter(col("_bin") ===
        floor(unix_timestamp(greatest(col(lLo), col(rLo))) / binSeconds))
      .drop("_bin")
  }

  /** Slowly-changing-dimension type-2 history from a change stream: one
    * validity interval per OBSERVED attribute state, consecutive identical
    * states collapsed (a change record that changes nothing does not open
    * a new version), `valid_to` = the next version's `valid_from` (NULL on
    * the current version) — the warehouse-native completion of the upsert
    * family (U2/U3 keep latest-state only; this keeps lineage).
    *
    * Precondition (standard SCD2, same as [[asofJoin]]'s): `changes` is
    * unique per (key, ts) — pre-aggregate conflicting same-instant
    * records first.
    *
    * Scale: one exchange on `key` and one per-key sort feed BOTH window
    * passes (dedupe-lag and valid-to-lead use the same window spec, so
    * the second pass reuses the first's ordering); group size is bounded
    * by a single key's change count, never the table.
    */
  def scd2History(changes: DataFrame, key: String, ts: String,
                  attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "scd2History needs at least one tracked attribute")
    val w = Window.partitionBy(key).orderBy(ts)
    val state = struct(attrs.map(col): _*)
    changes
      .withColumn("__prev", lag(state, 1).over(w))
      // null-safe: first row (__prev NULL) opens a version; nulls inside
      // attrs compare as values, not as unknowns
      .filter(!(col("__prev") <=> state))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev", ts)
  }

  /** Ordered funnel analysis — for each entity, the timestamps at which it
    * first reached each stage IN ORDER (stage k counts only strictly after
    * the stage k−1 hit: a purchase before the first click does not convert
    * the click funnel), and the furthest stage reached. The
    * match-first-sequence semantics of every product-analytics funnel.
    *
    * One conditional-min aggregate per stage, each chained through a join
    * on the PREVIOUS stage's hit time — `stages.length` exchanges, all on
    * the same entity key (co-partitioned, the exchange is reused), no
    * windows, no per-entity sorts: at 100 TB each stage pass is a
    * map-side-combined min over the stage's own events only. Entities that
    * never reach stage 1 still emit (stage 0) via the final left-join
    * chain onto the entity universe.
    *
    * Output: `(entity, t1..tN timestamps — NULL once fallen out, stage)`.
    */
  def funnelStages(events: DataFrame, entity: String, ts: String,
                   typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelStages needs at least one stage")
    val universe = events.select(col(entity)).distinct()
    // fold: hits(k) = per-entity min ts of stage-k events strictly after
    // the entity's stage-(k-1) hit
    val hits = stages.zipWithIndex.foldLeft(Option.empty[DataFrame]) {
      case (prev, (stage, i)) =>
        val own = events.filter(col(typeCol) === stage)
          .select(col(entity), col(ts).as("__t"))
        val qualified = prev match {
          case None => own
          case Some(p) =>
            own.join(p.select(col(entity), col(s"t$i").as("__prev")), Seq(entity))
              .filter(col("__t") > col("__prev"))
        }
        val mine = qualified.groupBy(col(entity))
          .agg(min(col("__t")).as(s"t${i + 1}"))
        Some(prev match {
          case None => mine
          case Some(p) => p.join(mine, Seq(entity), "left")
        })
    }.get
    val withTs = universe.join(hits, Seq(entity), "left")
    // ascending fold so the HIGHEST reached stage's `when` ends up
    // outermost (a descending fold would let stage 1 shadow everything)
    val stageCol = stages.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
    }
    withTs.withColumn("stage", stageCol.cast("long"))
  }

  /** Weekly cohort retention — the product-analytics staple: entities
    * cohort by the ISO week of their first event; a cell
    * `(cohort_week, week_offset)` counts the cohort's entities active in
    * that later week. Row `offset 0` is the cohort size by construction.
    *
    * Two map-side-combined aggregates (first-event per entity, distinct
    * active weeks per entity) joined on the entity key, then one
    * cells-sized count — no windows, and the distinct-week relation is
    * bounded by entities × weeks, not events.
    */
  def cohortRetention(events: DataFrame, entity: String, ts: String): DataFrame = {
    val first = events.groupBy(col(entity))
      .agg(date_trunc("week", min(col(ts))).as("cohort_week"))
    val active = events
      .select(col(entity), date_trunc("week", col(ts)).as("week"))
      .distinct()
    active.join(first, Seq(entity))
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
  }

  /** Time-weighted average per entity over an irregular event stream:
    * each observation holds from its timestamp to the next one
    * (step interpolation), so TWAP = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first)
    * — the correct mean for irregularly-sampled series where the
    * arithmetic mean over-weights bursts. All integer: values in cents,
    * durations in µs, Σ v·Δt exact in BIGINT (cents·µs ≈ 10⁶·10¹² keeps
    * ~10² rows of headroom per entity — callers with year-long spans
    * scale to ms). The last observation has no holding interval (step
    * semantics); single-event entities report the value itself.
    *
    * Scale shape: ONE window partitioning (lead) on the entity key plus
    * the per-entity aggregate on the same key — one exchange total;
    * per-row look-ahead state only (the [[graft.operators.Relational
    * .sequenceFeatures]] cost class).
    */
  def twap(events: DataFrame, entity: String, ts: String,
           value: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entity))
      .orderBy(col(ts).asc, col("cents").asc)
    val stepped = events
      .select(col(entity), col(ts),
        floor(col(value) * 100).cast("long").as("cents"))
      .withColumn("dt_us",
        unix_micros(lead(col(ts), 1).over(w)) - unix_micros(col(ts)))
    stepped.groupBy(col(entity))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents") * col("dt_us")).as("vdt"),
        sum(col("dt_us")).as("span_us"),
        min(struct(col(ts), col("cents"))).getField("cents").as("first_cents"))
      .select(col(entity), col("n_events"),
        when(col("span_us").isNull || col("span_us") === 0L, col("first_cents"))
          .otherwise(expr("vdt div span_us")).as("twap_cents"),
        coalesce(col("span_us"), lit(0L)).as("span_us"))
  }

  /** Calendar gap-fill with forward fill — resample an irregular per-key
    * event stream onto a dense daily grid from each key's first to last
    * active day, carrying the last observed value across silent days
    * (`observed` marks which grid rows are real). The regularization step
    * before any daily time-series model, and the canonical "no row ≠
    * zero" fix in activity reporting.
    *
    * Within a day the kept value is the one with the highest `tieBreak`
    * (sequence-number last-writer-wins — a total order both engines
    * replay). Days are emitted as `yyyy-MM-dd` strings (the house
    * cross-engine date discipline).
    *
    * Scale shape: one hash agg to a per-key-day rollup, an in-row
    * `sequence()` explode whose output is the grid (bounded by the key's
    * active span — a key silent for years does NOT pay for the gap until
    * it reappears, and the grid is O(span), not O(calendar)), and one
    * exchange on the key for the forward-fill window with O(1) state.
    */
  def fillDaily(events: DataFrame, userCol: String, tsCol: String,
                tieBreak: String, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        0)
    val daily = events
      .select(col(userCol).as("user_id"),
        to_date(col(tsCol)).as("day"),
        col(tieBreak).cast("long").as("_tb"),
        floor(col(valueCol) * 100).cast("long").as("_cents"))
      .groupBy("user_id", "day")
      .agg(max_by(col("_cents"), col("_tb")).as("day_cents"))
    val grid = daily
      .groupBy("user_id")
      .agg(min(col("day")).as("_lo"), max(col("day")).as("_hi"))
      .select(col("user_id"),
        explode(sequence(col("_lo"), col("_hi"),
          expr("interval 1 day"))).as("day"))
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("cents_filled",
        last(col("day_cents"), ignoreNulls = true).over(w))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cents_filled"),
        col("day_cents").isNotNull.as("observed"))
  }
}
