package graft.reddit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dbt layer: staging view + mart table
  * (models/staging/stg_reddit.sql, models/marts/reddit_summary.sql).
  */
object Models {

  /** P1: stg_reddit — the 9-column staging projection
    * (stg_reddit.sql:3-13), materialized as a view.
    */
  def stgReddit(reddit: DataFrame): DataFrame =
    reddit.select("id", "title", "score", "num_comments", "author",
      "created_utc", "subreddit", "selftext", "selftext_length")

  /** A1: reddit_summary — per-subreddit aggregate mart
    * (reddit_summary.sql:3-10), materialized as a table.
    */
  def redditSummary(stg: DataFrame): DataFrame =
    stg.groupBy("subreddit")
      .agg(
        count(lit(1)).as("post_count"),
        avg("score").as("avg_score"),
        avg("num_comments").as("avg_comments"),
        max("score").as("max_score"))

  /** Register both models on the session catalog (`dbt run` analog). */
  def registerViews(spark: SparkSession, reddit: DataFrame): Unit = {
    reddit.createOrReplaceTempView("reddit")
    stgReddit(reddit).createOrReplaceTempView("stg_reddit")
    redditSummary(stgReddit(reddit)).createOrReplaceTempView("reddit_summary")
  }
}
