package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketing utilities: pre-shuffle big tables ONCE at write time so every
  * later equi-join/aggregation on the bucket key is co-located — the
  * amortize-the-shuffle move for tables that are joined repeatedly at
  * 100 TB (pay one exchange at ingest, none per query).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted catalog table on `key`. Matching
    * bucket counts on both sides of a join eliminate both exchanges (and
    * the sort, since bucket files are sorted).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
