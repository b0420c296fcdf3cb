package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema evolution across ingest generations: older parquet files lack
  * columns newer ones carry (the reference's schema froze once in
  * `s3_to_redshift.py:163-180`; a long-lived lake's never does).
  *
  * `readMerged` gives the union schema with nulls for absent columns —
  * correct and zero-copy, but it reads EVERY file's footer to discover
  * schemas. At 100 TB / millions of files that listing-time cost is real:
  * prefer declaring the target schema explicitly (`readAs`) once the
  * union schema is known and recorded in a catalog — Spark then fills
  * missing columns per file without the footer sweep.
  */
object SchemaEvolution {

  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      // generations land as subdirectories; recurse instead of requiring
      // hive-style partition naming
      .option("recursiveFileLookup", "true")
      .parquet(path)

  /** Read with an explicitly declared union schema (no footer sweep):
    * files missing a declared column yield nulls for it, matching
    * [[readMerged]]'s semantics at catalog-known-schema cost.
    */
  def readAs(spark: SparkSession, path: String,
             schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("recursiveFileLookup", "true")
      .parquet(path)
}
