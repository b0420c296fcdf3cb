package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full freedom to
  * push filters and prune columns into the scan — at 100 TB the scan is
  * the dominant cost and `PushedFilters`/`ReadSchema` must stay tight.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-adaptive events load. Fixture generations have stored `ts` as
    * TIMESTAMP(NANOS) (rejected by Spark unless read as long nanos), as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (lands as TimestampNTZType),
    * or could store plain TIMESTAMP. Normalize every layout to
    * `TimestampType` with identical instant values under the UTC session,
    * so downstream window/watermark/date-part queries — and the DuckDB
    * oracle reading the same parquet — agree regardless of fixture vintage.
    */
  private def loadEvents(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw =
      try spark.read.parquet(path)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PARQUET_TYPE_ILLEGAL") ||
               e.getMessage.toLowerCase.contains("nanos") =>
          // Legacy NANOS fixtures: the nanosAsLong conf is the only way to
          // read them, and the vectorized reader consults it at execution
          // time too, so it must stay set for the frame's lifetime. Only
          // this dead-generation path mutates session state.
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(path)
      }
    raw.schema("ts").dataType match {
      case LongType =>
        // long nanos → micros via integer division (a double roundtrip
        // would lose precision at 1e18 ns)
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        // NTZ wall-clock reinterpreted as UTC instant (session TZ is UTC,
        // so the displayed values are unchanged)
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => raw
    }
  }

  /** Register every table as a temp view (the `spark.sql` surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
