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
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a table directory left by an EARLIER session is not in this
    // session's in-memory catalog, and saveAsTable refuses to claim an
    // orphan location — reclaim it so re-runs are idempotent
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // co-partition writers with the bucket layout: without this every task
    // writes a file into every bucket it has rows for (tasks × buckets tiny
    // files); with it each bucket is ONE file — which also lets later scans
    // use the sorted-bucket property without a re-sort
    df.repartition(buckets, df.col(key))
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
