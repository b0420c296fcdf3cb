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

  /** Self-contained SVG bar chart of a (label, value) result — the rendered
    * counterpart of [[exportChartCsv]], closing the reference's matplotlib
    * step (query-test.py:72-79) without a plotting dependency: pure string
    * assembly over an already-aggregated (small) result, written driver-side.
    */
  def exportChartSvg(result: DataFrame, labelCol: String, valueCol: String,
                     path: String, title: String = "",
                     width: Int = 640, height: Int = 360): Unit = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val rows = result
      .select(col(labelCol).cast("string"), col(valueCol).cast("double"))
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("null"),
        if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
    require(rows.nonEmpty, "exportChartSvg: empty result")
    val margin = 40
    val plotW = width - 2 * margin
    val plotH = height - 2 * margin
    // Locale-pinned decimal formatting: the f-interpolator uses the JVM
    // default locale, and "52,3" is not a valid SVG length on a
    // comma-decimal host (de_DE, fr_FR); NaN values are treated as 0 so
    // a single bad aggregate can't poison every bar height
    def n1(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(if (d.isNaN) 0.0 else d))
    val finite = rows.map(_._2).filterNot(v => v.isNaN || v.isInfinite)
    val vmax = math.max(if (finite.isEmpty) 0.0 else finite.max, Double.MinPositiveValue)
    val slot = plotW.toDouble / rows.length
    val barW = math.max(slot * 0.8, 1.0)
    val bars = rows.zipWithIndex.map { case ((label, v0), i) =>
      val v = if (v0.isNaN || v0.isInfinite) 0.0 else v0
      val h = math.max(plotH * (math.max(v, 0.0) / vmax), 0.0)
      val x = margin + i * slot + (slot - barW) / 2
      val y = margin + (plotH - h)
      val valueText = if (v == v.floor) v.toLong.toString
        else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
      s"""<rect x="${n1(x)}" y="${n1(y)}" width="${n1(barW)}" height="${n1(h)}" fill="#4878a8"/>
         |<text x="${n1(x + barW / 2)}" y="${height - margin + 14}" font-size="10" text-anchor="middle">${esc(label)}</text>
         |<text x="${n1(x + barW / 2)}" y="${n1(y - 4)}" font-size="9" text-anchor="middle">$valueText</text>""".stripMargin
    }.mkString("\n")
    val svg =
      s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">
         |<rect width="$width" height="$height" fill="white"/>
         |<text x="${width / 2}" y="20" font-size="13" text-anchor="middle">${esc(title)}</text>
         |<line x1="$margin" y1="${height - margin}" x2="${width - margin}" y2="${height - margin}" stroke="black"/>
         |<line x1="$margin" y1="$margin" x2="$margin" y2="${height - margin}" stroke="black"/>
         |$bars
         |</svg>
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      svg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

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
