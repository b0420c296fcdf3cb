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
    *
    * `table` must be an unqualified name: the orphan-reclaim below derives
    * the managed location by the warehouse naming convention, which is
    * wrong for `db.tbl` or custom-`LOCATION` tables — those are rejected
    * rather than risked.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    require(!table.contains("."),
      s"writeBucketed: unqualified table names only (got '$table') — the " +
        "orphan-directory reclaim assumes the default-database managed layout")
    reclaimManagedLocation(df.sparkSession, table)
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

  /** DROP `table` and delete its managed warehouse directory if a stale
    * one survives from an EARLIER session: the catalog forgets across
    * sessions but the directory doesn't, and saveAsTable refuses to claim
    * an orphan location — reclaim so overwrite-style writers are
    * idempotent. Deleting by naming convention is only safe if the
    * directory actually LOOKS like a Spark-managed parquet table dir:
    * anything unexpected inside means it isn't ours, and we fail instead
    * of recursively deleting it.
    */
  private[graft] def reclaimManagedLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) {
      def looksManaged(n: String): Boolean =
        n.startsWith("part-") || n == "_SUCCESS" || n == "_temporary" ||
          n.startsWith(".") || n.endsWith(".crc")
      val unexpected = fs.listStatus(loc).map(_.getPath.getName).filterNot(looksManaged)
      require(unexpected.isEmpty,
        s"reclaimManagedLocation: refusing to reclaim $loc — it contains entries " +
          s"that don't look like a managed parquet table (${unexpected.mkString(", ")})")
      fs.delete(loc, true): Unit
    }
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Rewrite a bucketed table so each bucket holds exactly ONE file.
    *
    * Appends (e.g. [[graft.operators.Dedup.appendFingerprintIndex]]) add a
    * file per ingest generation to every bucket. The bucketed-join property
    * survives (still no exchange), but multi-file buckets lose the
    * sorted-scan property — Spark only trusts a bucket's sort order when
    * the bucket is a single file — so joins re-introduce per-bucket local
    * sorts. Compaction writes the rows to a shadow table with the same
    * bucket spec (the repartition in [[writeBucketed]] puts each bucket's
    * rows in exactly one task → one file), then swaps it in with a
    * DROP + RENAME. The swap is NOT one atomic catalog op: a crash between
    * the two statements leaves the data safe in the shadow table but the
    * live name missing — which the next [[compact]] (or [[recoverCompact]]
    * directly) heals by completing the pending rename before doing
    * anything else.
    */
  def compact(spark: SparkSession, table: String, key: String, buckets: Int): Unit = {
    require(!table.contains("."),
      s"compact: unqualified table names only (got '$table')")
    recoverCompact(spark, table)
    val tmp = table + "__compact"
    // subtle planner interaction: reading a bucketed table, the optimizer
    // drops writeBucketed's repartition as redundant (the bucket metadata
    // already promises hash(key) partitioning) — but with auto-bucketed-scan
    // the planner may THEN disable the bucketed scan, leaving arbitrary
    // file-split partitions and a file per (task × bucket). Forcing the
    // bucketed scan makes partition i exactly bucket i: the compaction runs
    // with NO shuffle at all — each task merge-sorts one bucket's files
    // into one file
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(autoKey, "true")
    spark.conf.set(autoKey, "false")
    try writeBucketed(spark.table(table), tmp, key, buckets)
    finally spark.conf.set(autoKey, prev)
    // carry graft-owned table properties (e.g. the LSH parameters) onto the
    // shadow before the swap — a compaction must not strip the metadata
    // that parameter validation depends on
    val graftProps = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .properties.filter(_._1.startsWith("graft."))
    if (graftProps.nonEmpty)
      spark.sql(s"ALTER TABLE `$tmp` SET TBLPROPERTIES (" +
        graftProps.map { case (k, v) => s"'$k'='$v'" }.mkString(", ") + ")")
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }

  /** Complete a compaction swap that crashed between DROP and RENAME:
    * if the live table is gone but its shadow exists, rename the shadow
    * in. Idempotent; a no-op when the table is healthy.
    */
  def recoverCompact(spark: SparkSession, table: String): Unit = {
    val tmp = table + "__compact"
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp))
      spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }

  /** The bucket count a table was actually written with — so callers
    * re-bucketing (compaction, appends) can't silently change the spec.
    */
  def bucketCount(spark: SparkSession, table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec
      .getOrElse(throw new IllegalArgumentException(
        s"bucketCount: table '$table' is not bucketed"))
      .numBuckets
}
