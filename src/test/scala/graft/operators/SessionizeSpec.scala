package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap splits sessions; bounds and counts are right") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),
      (1L, ts("2024-01-01 11:30:00"), 3L), // > 30 min gap → new session
      (2L, ts("2024-01-01 09:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val out = Sessionize.sessionStats(events, "user_id", "ts", "event_id", 1800L)
      .collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L), (2L, 1L)))
    assert(u1.head.getString(3) == "2024-01-01 10:00:00")
    assert(u1.head.getString(4) == "2024-01-01 10:10:00")
    assert(out.count(_.getLong(0) == 2L) == 1)
  }

  test("ewmaFixedPoint: hand trajectory, truncation on negatives, repartition-stable") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 100L),
      (1L, ts("2024-01-01 10:01:00"), 2L, 20L),
      (1L, ts("2024-01-01 10:02:00"), 3L, -50L),
      (2L, ts("2024-01-01 10:00:00"), 4L, 7L))
      .toDF("user_id", "ts", "event_id", "cents")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sessionize.ewmaFixedPoint(df, "user_id", "ts", "event_id", "cents", 1L, 4L)
        .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    val got = run(ev)
    // s1=100; s2=(20+300)/4=80; s3=(-50+240)/4=190/4 → 47 (trunc, not 48 rounding)
    assert(got == Map(1L -> 100L, 2L -> 80L, 3L -> 47L, 4L -> 7L), s"got $got")
    // negative state truncates toward zero like SQL integer division
    val neg = Seq((1L, ts("2024-01-01 10:00:00"), 1L, -100L),
      (1L, ts("2024-01-01 10:01:00"), 2L, -1L))
      .toDF("user_id", "ts", "event_id", "cents")
    // s2 = (-1 + 3·(-100))/4 = -301/4 = -75 (trunc), not -76 (floor)
    assert(run(neg)(2L) == -75L)
    assert(run(ev.repartition(7)) == got)
  }
}
