package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: inclusive latest-at-or-before semantics, null when no dim precedes") {
    val dim = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 20:00:00"), "b"),
      (2L, ts("2024-01-01 15:00:00"), "c")).toDF("k", "ts", "v")
    val probe = Seq(
      (1L, ts("2024-01-01 09:00:00")), // before any dim → null
      (1L, ts("2024-01-01 10:00:00")), // exactly at → inclusive 'a'
      (1L, ts("2024-01-01 19:59:59")), // between → 'a'
      (1L, ts("2024-01-01 21:00:00")), // after both → 'b'
      (2L, ts("2024-01-01 16:00:00")) // other key → 'c', never leaks k=1 state
    ).toDF("k", "ts")
    val out = Temporal.asofJoin(probe, dim, "k", "ts", Seq("v"))
      .orderBy("k", "ts").collect()
    assert(out.map(r => Option(r.getAs[String]("v"))).toSeq ==
      Seq(None, Some("a"), Some("a"), Some("b"), Some("c")))
  }

  test("asofJoin: probe columns survive and payload is the whole dim row state") {
    val dim = Seq((1L, ts("2024-01-01 10:00:00"), 5.0, "x")).toDF("k", "ts", "m", "tag")
    val probe = Seq((1L, ts("2024-01-01 11:00:00"), 99L)).toDF("k", "ts", "payload")
    val r = Temporal.asofJoin(probe, dim, "k", "ts", Seq("m", "tag")).collect().head
    assert(r.getAs[Long]("payload") == 99L)
    assert(r.getAs[Double]("m") == 5.0 && r.getAs[String]("tag") == "x")
  }

  test("asofJoin fails fast on reserved-name or valueCols collisions with probe") {
    val dim = Seq((1L, ts("2024-01-01 10:00:00"), 5.0)).toDF("k", "ts", "m")
    val clashReserved = Seq((1L, ts("2024-01-01 11:00:00"), 0)).toDF("k", "ts", "_asof")
    intercept[IllegalArgumentException](
      Temporal.asofJoin(clashReserved, dim, "k", "ts", Seq("m")))
    val clashValue = Seq((1L, ts("2024-01-01 11:00:00"), 0.0)).toDF("k", "ts", "m")
    intercept[IllegalArgumentException](
      Temporal.asofJoin(clashValue, dim, "k", "ts", Seq("m")))
  }

  test("rangeJoin: boundary-inclusive, bin-spanning intervals, no duplicates") {
    val points = Seq(
      (1L, 101L, ts("2024-01-01 10:00:00")), // == lo
      (1L, 102L, ts("2024-01-01 11:30:00")), // inside (different bin than lo)
      (1L, 103L, ts("2024-01-01 12:00:00")), // == hi
      (1L, 104L, ts("2024-01-01 12:00:01")), // just past hi → no match
      (2L, 201L, ts("2024-01-01 11:00:00")) // other key → no match
    ).toDF("k", "pid", "ts")
    val intervals = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("k", "iid", "lo", "hi")
    val out = Temporal.rangeJoin(points, intervals, "k", "ts", "lo", "hi",
      binSeconds = 600L)
    val matched = out.select("pid").as[Long].collect().sorted.toSeq
    assert(matched == Seq(101L, 102L, 103L)) // exactly once each
  }

  test("asofJoin plan: one exchange total (union rides a single key shuffle), no join node") {
    val dim = Seq((1L, ts("2024-01-01 10:00:00"), "a")).toDF("k", "ts", "v")
    val probe = Seq((1L, ts("2024-01-01 11:00:00"))).toDF("k", "ts")
    val p = Temporal.asofJoin(probe, dim, "k", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"asof join shuffles $exchanges times:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"asof join planned an actual join:\n$p")
  }

  test("rangeJoin plan: equi-join on (key, bin), no cartesian/nested-loop") {
    val points = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "ts")
    val intervals = Seq((1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("k", "lo", "hi")
    val p = Temporal.rangeJoin(points, intervals, "k", "ts", "lo", "hi", 3600L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n$p")
  }

  test("scd2History: versions open on change only, close at the successor, flag the current") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), "gold"),
      (1L, ts("2024-02-01 00:00:00"), "gold"),   // no-op: must NOT open a version
      (1L, ts("2024-03-01 00:00:00"), "silver"),
      (1L, ts("2024-04-01 00:00:00"), "gold"),   // back to gold: NEW version, not merged
      (2L, ts("2024-01-15 00:00:00"), "bronze")
    ).toDF("k", "eff", "tier")
    val out = Temporal.scd2History(changes, "k", "eff", Seq("tier"))
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("tier"),
        Option(r.getAs[Timestamp]("valid_to")).map(_.toString),
        r.getAs[Boolean]("is_current")))
    assert(out.toSeq == Seq(
      (1L, "gold", Some("2024-03-01 00:00:00.0"), false),
      (1L, "silver", Some("2024-04-01 00:00:00.0"), false),
      (1L, "gold", None, true),
      (2L, "bronze", None, true)))
  }

  test("scd2History: null attribute values are states, not unknowns") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), Option("a")),
      (1L, ts("2024-02-01 00:00:00"), None: Option[String]), // a → NULL is a change
      (1L, ts("2024-03-01 00:00:00"), None: Option[String])  // NULL → NULL is not
    ).toDF("k", "eff", "v")
    val out = Temporal.scd2History(changes, "k", "eff", Seq("v")).collect()
    assert(out.length == 2)
  }

  test("scd2History plan: both window passes ride one exchange and one sort") {
    val changes = Seq((1L, ts("2024-01-01 00:00:00"), "a")).toDF("k", "eff", "v")
    val p = Temporal.scd2History(changes, "k", "eff", Seq("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    val sorts = "Sort \\[".r.findAllIn(p).length
    assert(exchanges <= 1, s"scd2 shuffles $exchanges times:\n$p")
    assert(sorts <= 1, s"scd2 re-sorts between windows ($sorts sorts):\n$p")
  }

  test("asofJoinDirectional: forward and nearest semantics, ties backward") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dim = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 200.0)).toDF("k", "ts", "v")
    val probe = Seq(
      (10L, 1L, ts("2024-01-01 09:00:00")),  // before all: fwd=100, near=100
      (11L, 1L, ts("2024-01-01 10:30:00")),  // back 100 (30m), fwd 200 (90m) -> near 100
      (12L, 1L, ts("2024-01-01 11:00:00")),  // EXACT tie 60m/60m -> backward 100
      (13L, 1L, ts("2024-01-01 11:30:00")),  // back 100 (90m), fwd 200 (30m) -> near 200
      (14L, 1L, ts("2024-01-01 12:00:00")),  // exact match both directions -> 200
      (15L, 1L, ts("2024-01-01 13:00:00"))   // after all: fwd NULL, near=200
    ).toDF("id", "k", "ts")
    def run(dir: String) =
      Temporal.asofJoinDirectional(probe, dim, "k", "ts", Seq("v"), dir)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val fwd = run("forward")
    assert(fwd == Map(10L -> Some(100.0), 11L -> Some(200.0), 12L -> Some(200.0),
      13L -> Some(200.0), 14L -> Some(200.0), 15L -> None))
    val near = run("nearest")
    assert(near == Map(10L -> Some(100.0), 11L -> Some(100.0), 12L -> Some(100.0),
      13L -> Some(200.0), 14L -> Some(200.0), 15L -> Some(200.0)))
    val back = run("backward")
    assert(back == Map(10L -> None, 11L -> Some(100.0), 12L -> Some(100.0),
      13L -> Some(100.0), 14L -> Some(200.0), 15L -> Some(200.0)))
  }

  test("funnelStages: strictly-after chaining, fallouts at every stage, zero-stage users") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: purchase BEFORE the click → stops at stage 2
      (2L, "view", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(3)),
      // user 3: click before any view → stage 1 only (click doesn't chain)
      (3L, "click", ts(1)), (3L, "view", ts(2)),
      // user 4: never enters
      (4L, "error", ts(1)),
      // user 5: SAME-timestamp click as the first view — strict > excludes
      // it, the later one converts
      (5L, "view", ts(1)), (5L, "click", ts(1)), (5L, "click", ts(4)))
      .toDF("user_id", "event_type", "ts")
    val out = Temporal.funnelStages(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("stage"), Option(r.getAs[Timestamp]("t2")))).toMap
    assert(out(1L) == ((3L, Some(ts(2)))))
    assert(out(2L) == ((2L, Some(ts(3)))))  // click converts, purchase never re-fires
    assert(out(3L) == ((1L, None)))
    assert(out(4L) == ((0L, None)))
    assert(out(5L) == ((2L, Some(ts(4)))), "same-instant click must not convert")
  }

  test("overlapJoin: inclusive bounds, multi-bin pairs emit once, no nested loop") {
    def ts(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val a = Seq(
      (1L, 1L, ts(1), ts(9)),   // spans 8+ hourly bins
      (2L, 1L, ts(10), ts(11)),
      (3L, 2L, ts(1), ts(2)))   // other key
      .toDF("a_id", "k", "a_lo", "a_hi")
    val b = Seq(
      (10L, 1L, ts(3), ts(12)), // overlaps a1 across MANY shared bins + a2
      (11L, 1L, ts(9), ts(9, 30)),  // touches a1 exactly at its end (inclusive)
      (12L, 1L, ts(13), ts(14)),    // disjoint
      (13L, 2L, ts(2), ts(3)))      // touches a3 at a bin boundary
      .toDF("b_id", "k", "b_lo", "b_hi")
    val out = Temporal.overlapJoin(a, b, "k", "a_lo", "a_hi", "b_lo", "b_hi", 3600L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly-once despite bin sharing: no duplicate pairs at all
    assert(out.length == out.toSet.size, s"duplicate pairs: ${out.toSeq}")
    assert(out.toSet == Set((1L, 10L), (2L, 10L), (1L, 11L), (3L, 13L)),
      s"got ${out.toSet}")
    val plan = Temporal.overlapJoin(a, b, "k", "a_lo", "a_hi", "b_lo", "b_hi", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"overlap join fell back to a nested loop:\n$plan")
  }

  test("cohortRetention: offset 0 is cohort size; gaps stay absent") {
    def t(d: Int, h: Int = 0) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // weeks: Mon 2024-01-01, Mon 2024-01-08, Mon 2024-01-15
    val ev = Seq(
      (1L, t(2)), (1L, t(9)), (1L, t(16)),   // cohort w0, active offsets 0,1,2
      (2L, t(3)), (2L, t(17)),               // cohort w0, offsets 0,2 (gap at 1)
      (3L, t(10)))                           // cohort w1, offset 0 only
      .toDF("user_id", "ts")
    val got = Temporal.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getTimestamp(0).toString.substring(0, 10),
        r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 2L) -> 2L, ("2024-01-08", 0L) -> 1L), s"got $got")
  }

  test("twap: step interpolation, burst doesn't over-weight, singletons and same-ts ties") {
    val ev = Seq(
      // user 1: 1.00 holds 10s, 3.00 holds 30s → (100·10 + 300·30)/40 = 250
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:00:10"), 3.0),
      (1L, ts("2024-01-01 00:00:40"), 2.0),
      // user 2: a 3-event BURST at 9.00 then a long 1.00 hold — the
      // arithmetic mean says 6.5, TWAP must say ~1 side
      (2L, ts("2024-01-01 00:00:00"), 9.0),
      (2L, ts("2024-01-01 00:00:01"), 9.0),
      (2L, ts("2024-01-01 00:00:02"), 9.0),
      (2L, ts("2024-01-01 00:00:03"), 1.0),
      (2L, ts("2024-01-01 01:00:00"), 5.0),
      // user 3: singleton → value itself, zero span
      (3L, ts("2024-01-01 00:00:00"), 7.5),
      // user 4: all events at ONE timestamp → zero span, first by tie
      (4L, ts("2024-01-01 00:00:00"), 4.0),
      (4L, ts("2024-01-01 00:00:00"), 2.0)
    ).toDF("user_id", "ts", "value")
    val out = Temporal.twap(ev, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("twap_cents"),
         r.getAs[Long]("span_us"))).toMap
    assert(out(1L) == ((3L, 250L, 40000000L)))
    // user 2: (900·1 + 900·1 + 900·1 + 100·3597)/3600 = 100.6… → 100
    assert(out(2L) == ((5L, (900L * 3 + 100L * 3597) / 3600, 3600000000L)))
    assert(out(3L) == ((1L, 750L, 0L)))
    assert(out(4L) == ((2L, 200L, 0L)))  // tie → smaller cents is "first"
  }

  test("fillDaily: dense grid, forward fill, within-day last-writer-wins") {
    import spark.implicits._
    // user 1: events on day 1 (two — ids 10 then 11), day 4; grid = 1..4
    // user 2: single-day user -> one grid row
    val day = 86400L
    val ev = Seq(
      (1L, 0L * day + 100L, 10L, 3.00d),  // day 1, overwritten by id 11
      (1L, 0L * day + 50L, 11L, 5.00d),   // later id wins despite earlier ts
      (1L, 3L * day + 10L, 12L, 9.00d),   // day 4
      (2L, 1L * day, 20L, 7.00d))
      .toDF("user_id", "tsec", "event_id", "value")
      .select(col("user_id"), timestamp_seconds(col("tsec")).as("ts"),
        col("event_id"), col("value"))
    val out = Temporal.fillDaily(ev.repartition(3), "user_id", "ts",
        "event_id", "value")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("day")) ->
        ((r.getAs[Long]("cents_filled"), r.getAs[Boolean]("observed")))).toMap
    assert(out.size == 5, s"grid size: ${out.keys}")
    assert(out((1L, "1970-01-01")) == ((500L, true)),
      "highest event id wins within the day")
    assert(out((1L, "1970-01-02")) == ((500L, false)), "gap carries forward")
    assert(out((1L, "1970-01-03")) == ((500L, false)))
    assert(out((1L, "1970-01-04")) == ((900L, true)))
    assert(out((2L, "1970-01-02")) == ((700L, true)))
  }
}
