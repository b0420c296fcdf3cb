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
}
