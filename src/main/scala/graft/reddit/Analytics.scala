package graft.reddit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The three acceptance queries (query-test.py:32-67) in both DataFrame and
  * `spark.sql` form — the reference's entire ad-hoc query surface.
  */
object Analytics {

  /** T1: top-2 posts by score (query-test.py:32-37). */
  def topPosts(reddit: DataFrame, k: Int = 2): DataFrame =
    reddit.orderBy(desc("score"), col("id")).limit(k)

  /** A2: per-subreddit stats, HAVING count>5, ORDER BY avg_score DESC
    * (query-test.py:44-53; the reference omits `subreddit` from SELECT — we
    * include it, as SURVEY §2.4 decides).
    */
  def subredditStats(reddit: DataFrame, minPosts: Long = 5): DataFrame =
    reddit.groupBy("subreddit")
      .agg(
        count(lit(1)).as("post_count"),
        avg("score").as("avg_score"),
        avg("num_comments").as("avg_comments"))
      .filter(col("post_count") > minPosts)
      .orderBy(desc("avg_score"), col("subreddit"))

  /** A3: average score by hour of created_utc (query-test.py:60-67). */
  def scoreByHour(reddit: DataFrame): DataFrame =
    reddit.groupBy(hour(col("created_utc")).as("hour_of_day"))
      .agg(avg("score").as("avg_score"))
      .orderBy("hour_of_day")

  /** The reference's chart surface (query-test.py:72-79 renders A2 as a bar
    * chart): materialize a query result as one chart-ready CSV artifact
    * (header row, single file) for any plotting frontend. Presentation
    * layer: only ever called on already-aggregated (small) results.
    */
  def exportChartCsv(result: DataFrame, path: String): Unit =
    result.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Same three via the SQL surface (S8) against registered views. */
  def sqlTopPosts(spark: SparkSession, k: Int = 2): DataFrame =
    spark.sql(s"SELECT * FROM reddit ORDER BY score DESC, id LIMIT $k")

  def sqlSubredditStats(spark: SparkSession): DataFrame =
    spark.sql("""SELECT subreddit, count(*) AS post_count, avg(score) AS avg_score,
                |  avg(num_comments) AS avg_comments
                |FROM stg_reddit GROUP BY subreddit HAVING count(*) > 5
                |ORDER BY avg_score DESC, subreddit""".stripMargin)

  def sqlScoreByHour(spark: SparkSession): DataFrame =
    spark.sql("""SELECT hour(created_utc) AS hour_of_day, avg(score) AS avg_score
                |FROM reddit GROUP BY 1 ORDER BY 1""".stripMargin)
}
