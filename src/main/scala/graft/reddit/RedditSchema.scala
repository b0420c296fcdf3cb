package graft.reddit

import org.apache.spark.sql.types._

/** Single source of truth for the reference's 16-column posts table.
  *
  * Authoritative DDL: /root/reference/airflow/extraction/s3_to_redshift.py:161-181
  * (types), produced by extract-from-reddit.py (field list :208-212, derived
  * columns :115,137,166). Booleans are *stored* as "True"/"False" strings in
  * the reference CSV/warehouse (varchar(10), s3_to_redshift.py:172-174,179);
  * we parse them to BooleanType at ingest and format them back as literal
  * strings on CSV write so fixture round-trips are byte-compatible.
  */
object RedditSchema {

  final case class RedditPost(
      id: String,
      title: Option[String],
      score: Int,
      num_comments: Int,
      author: Option[String],
      created_utc: Option[java.sql.Timestamp],
      url: Option[String],
      upvote_ratio: Double,
      over_18: Option[Boolean],
      spoiler: Option[Boolean],
      stickied: Option[Boolean],
      selftext: Option[String],
      subreddit: Option[String],
      extraction_timestamp: Option[java.sql.Timestamp],
      selftext_length: Option[Int],
      is_nsfw: Option[Boolean])

  val booleanColumns: Seq[String] = Seq("over_18", "spoiler", "stickied", "is_nsfw")

  /** Parsed (engine-side) schema. */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("title", StringType),
    StructField("score", IntegerType),
    StructField("num_comments", IntegerType),
    StructField("author", StringType),
    StructField("created_utc", TimestampType),
    StructField("url", StringType),
    StructField("upvote_ratio", DoubleType),
    StructField("over_18", BooleanType),
    StructField("spoiler", BooleanType),
    StructField("stickied", BooleanType),
    StructField("selftext", StringType),
    StructField("subreddit", StringType),
    StructField("extraction_timestamp", TimestampType),
    StructField("selftext_length", IntegerType),
    StructField("is_nsfw", BooleanType)))

  val columns: Seq[String] = schema.fieldNames.toSeq

  /** Raw CSV-read schema: everything string (parse in a second pass so a bad
    * cell nulls one column, not the row) + the corrupt-record column that
    * implements the MAXERROR budget.
    */
  val rawCsvSchema: StructType = StructType(
    columns.map(StructField(_, StringType)) :+
      StructField("_corrupt_record", StringType))

  /** Redshift varchar widths (s3_to_redshift.py:163-180) for TRUNCATECOLUMNS. */
  val varcharWidths: Map[String, Int] = Map(
    "id" -> 100, "title" -> 4000, "author" -> 100, "url" -> 2000,
    "selftext" -> 65535, "subreddit" -> 100)
}
