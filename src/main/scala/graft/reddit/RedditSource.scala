package graft.reddit

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/T4: the Reddit API scan re-expressed as a pluggable source with the
  * PRAW `subreddit.top(time_filter, limit)` semantics
  * (extract-from-reddit.py:61-75): ranked top-N posts within a trailing
  * time window.
  *
  * Zero-egress: the default implementation replays the reference's own
  * extracted fixtures (CSV) — a live API client would slot in behind the
  * same trait without touching downstream code. Retry/throttle
  * (extract-from-reddit.py:35-59,86-88) is a source-transport concern and
  * deliberately lives behind this boundary.
  */
trait RedditSource {
  /** All posts visible to the source for one subreddit. */
  def posts(spark: SparkSession, subreddit: String): DataFrame
}

object RedditSource {

  /** PRAW time_filter → trailing window length. */
  val windows: Map[String, Long] = Map(
    "hour" -> 3600L, "day" -> 86400L, "week" -> 7L * 86400,
    "month" -> 30L * 86400, "year" -> 365L * 86400, "all" -> Long.MaxValue / 2)

  /** `top(time_filter, limit)`: filter to the trailing window ending at
    * `now`, rank by score desc (id tiebreak for determinism), take N —
    * Catalyst plans TakeOrderedAndProject, no full sort.
    */
  def top(posts: DataFrame, timeFilter: String, limit: Int, now: Timestamp): DataFrame = {
    val horizon = windows.getOrElse(timeFilter,
      throw new IllegalArgumentException(s"unknown time_filter: $timeFilter"))
    val start = lit(now).cast("timestamp") - expr(s"INTERVAL '$horizon' SECOND")
    posts
      .filter(col("created_utc").isNotNull && col("created_utc") >= start &&
        col("created_utc") <= lit(now))
      .orderBy(desc("score"), col("id"))
      .limit(limit)
  }

  /** Fixture-backed source: replays a reference CSV extract. */
  def fixture(path: String): RedditSource = new RedditSource {
    def posts(spark: SparkSession, subreddit: String): DataFrame =
      CsvReddit.read(spark, path).filter(col("subreddit") === subreddit)
  }

  /** JSON-dump source (API responses archived as JSON lines, the other
    * fixture format a live client would write): schema-first read, same
    * canonical shape.
    */
  def jsonFixture(path: String): RedditSource = new RedditSource {
    def posts(spark: SparkSession, subreddit: String): DataFrame =
      spark.read.schema(RedditSchema.schema).json(path)
        .filter(col("subreddit") === subreddit)
  }

  /** The whole S1 scan: source → window filter → rank → limit. */
  def scan(spark: SparkSession, source: RedditSource, subreddit: String,
           timeFilter: String, limit: Int, now: Timestamp): DataFrame =
    top(source.posts(spark, subreddit), timeFilter, limit, now)
}

/** S4: the S3 object layout (upload_to_s3.py:41-47) — one object per run
  * date. Paths only; Spark writes directly to the filesystem/object store.
  */
object S3Layout {
  def dailyKey(runDate: java.time.LocalDate): String =
    runDate.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE) + ".csv"

  def dailyPath(bucket: String, runDate: java.time.LocalDate): String =
    s"$bucket/${dailyKey(runDate)}"
}
