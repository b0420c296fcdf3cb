package graft.reddit

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** S6/S7/U3/U4: the persistent `reddit` table as a directory-versioned
  * parquet table with an atomic-swap writer.
  *
  * Layout: `<root>/v_<n>/` holds one immutable table version; `<root>/CURRENT`
  * names the live version. A write lands fully in a new `v_<n+1>` directory
  * before CURRENT flips (atomic file move), so readers never observe a
  * partial table and the read-antijoin-union upsert never overwrites files it
  * is still reading — the U4 transaction-boundary semantics the reference
  * gets from psycopg2 commit (s3_to_redshift.py:337-376), done the way an
  * object-store table format does it (versioned dirs + a pointer flip).
  *
  * Data is partitioned by `extract_date` (one daily micro-batch = one
  * partition) so date-ranged queries prune partitions and daily ingest only
  * writes new directories.
  */
object PostsTable {

  private def currentFile(root: String): Path = Paths.get(root, "CURRENT")

  private def versionDir(root: String, v: Long): Path = Paths.get(root, s"v_$v")

  def currentVersion(root: String): Option[Long] = {
    val f = currentFile(root)
    if (Files.exists(f)) Some(Files.readString(f).trim.toLong) else None
  }

  def exists(root: String): Boolean = currentVersion(root).isDefined

  /** Read the live version. Fails if the table was never initialized. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"PostsTable at $root not initialized"))
    spark.read.parquet(versionDir(root, v).toString)
  }

  private def writeVersion(df: DataFrame, root: String, v: Long): Unit = {
    val tmp = Paths.get(root, s"_tmp_v_$v")
    deleteRecursively(tmp)
    // date-partitioned when the batch carries the extraction clock (one
    // daily micro-batch = one partition → partition pruning on date ranges)
    val writer =
      if (df.columns.contains("extraction_timestamp"))
        df.withColumn("extract_date", to_date(col("extraction_timestamp")))
          .write.partitionBy("extract_date")
      else df.write
    writer.mode("overwrite").parquet(tmp.toString)
    Files.move(tmp, versionDir(root, v), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Flip CURRENT atomically (write-new + atomic move over the pointer). */
  private def commit(root: String, v: Long): Unit = {
    val next = Paths.get(root, s"_CURRENT_$v")
    Files.writeString(next, v.toString)
    Files.move(next, currentFile(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** S6: create/replace the table from a first batch. */
  def create(df: DataFrame, root: String): Unit = {
    Files.createDirectories(Paths.get(root))
    val v = currentVersion(root).getOrElse(-1L) + 1
    writeVersion(df, root, v)
    commit(root, v)
  }

  /** U3+U4: delete-matching ∪ insert as one atomic version bump
    * (s3_to_redshift.py:226-232, intent :9-15). Broadcast anti-join: the
    * daily batch is ≤10³ rows, the table never shuffles. Idempotent —
    * re-upserting the same batch yields an identical table.
    */
  def upsert(spark: SparkSession, root: String, staging: DataFrame, key: String = "id"): Unit = {
    if (!exists(root)) { create(staging, root); return }
    val main = read(spark, root).drop("extract_date")
    val merged = Relational.upsert(main, staging, key)
    val v = currentVersion(root).get + 1
    writeVersion(merged, root, v)
    commit(root, v)
    vacuum(root, keep = 2)
  }

  /** Drop all but the newest `keep` versions (old readers get a grace
    * window; storage stays bounded).
    */
  def vacuum(root: String, keep: Int): Unit = {
    val cur = currentVersion(root).getOrElse(return)
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return
    Files.list(dir).forEach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("v_") && n.drop(2).forall(_.isDigit)
          && n.drop(2).toLong <= cur - keep)
        deleteRecursively(p)
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
}
