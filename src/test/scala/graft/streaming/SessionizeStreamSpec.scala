package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

class SessionizeStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState sessionization closes sessions on event-time gaps") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Streams.SessionEvent]
    val q = Streams.sessionize(mem.toDS(), gapSeconds = 1800L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").start()

    mem.addData(
      Streams.SessionEvent(1L, ts("2024-01-01 10:00:00")),
      Streams.SessionEvent(1L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    // an event far past the gap closes user 1's first session (in-batch
    // split on the next trigger) and advances the watermark
    mem.addData(Streams.SessionEvent(1L, ts("2024-01-01 12:00:00")))
    q.processAllAvailable()
    mem.addData(Streams.SessionEvent(2L, ts("2024-01-01 15:00:00")))
    q.processAllAvailable()

    val sessions = spark.table("sessions_test").as[Streams.UserSession].collect()
    q.stop()
    val first = sessions.find(s => s.user_id == 1L && s.n_events == 2L)
    assert(first.isDefined, s"expected closed 2-event session, got ${sessions.toSeq}")
    assert(first.get.session_start == ts("2024-01-01 10:00:00"))
    assert(first.get.session_end == ts("2024-01-01 10:10:00"))
  }
}
