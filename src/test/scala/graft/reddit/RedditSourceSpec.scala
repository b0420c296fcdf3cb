package graft.reddit

import java.sql.Timestamp

import graft.SparkTestBase

class RedditSourceSpec extends SparkTestBase {

  private val fix = "/root/reference/tmp/20250324.csv"
  // fixture extraction ran 2025-03-24; a "week" window ending then covers most rows
  private val now = Timestamp.valueOf("2025-03-24 23:59:59")

  test("top(time_filter, limit): trailing window + ranked top-N") {
    val src = RedditSource.fixture(fix)
    val week = RedditSource.scan(spark, src, "stocks", "week", 10, now)
    val rows = week.collect()
    assert(rows.length == 10)
    // ranked by score desc
    val scores = rows.map(_.getAs[Int]("score")).toSeq
    assert(scores == scores.sorted.reverse)
    // all inside the window
    val weekAgo = Timestamp.valueOf("2025-03-17 23:59:59")
    assert(rows.forall(r => !r.getAs[Timestamp]("created_utc").before(weekAgo)))

    // a narrower window yields a subset
    val day = RedditSource.scan(spark, src, "stocks", "day", 1000, now)
    assert(day.count() <= week.count() + 1000) // sanity
    assert(day.count() < 183)
  }

  test("json fixture source round-trips the canonical schema") {
    val df = CsvReddit.read(spark, fix)
    val dir = java.nio.file.Files.createTempDirectory("jsonfix").toString + "/posts"
    df.coalesce(1).write.json(dir)
    val back = RedditSource.jsonFixture(dir).posts(spark, "stocks")
    assert(back.count() == df.count())
    assert(back.schema == RedditSchema.schema ||
      back.columns.toSeq == RedditSchema.columns)
    val top = RedditSource.top(back, "week", 5, now).collect()
    assert(top.length == 5)
  }

  test("unknown time_filter is rejected") {
    intercept[IllegalArgumentException] {
      RedditSource.top(CsvReddit.read(spark, fix), "fortnight", 5, now)
    }
  }

  test("S3 layout: one object per run date, yyyyMMdd key") {
    assert(S3Layout.dailyKey(java.time.LocalDate.of(2025, 3, 24)) == "20250324.csv")
    assert(S3Layout.dailyPath("s3a://bkt", java.time.LocalDate.of(2025, 3, 24))
      == "s3a://bkt/20250324.csv")
  }
}
