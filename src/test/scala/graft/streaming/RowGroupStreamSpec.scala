package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkTestBase

/** The DSv2 row-group streaming source: rate-limited admission (groups
  * and rows), exactly-once slice delivery, checkpoint resume, loud
  * failure on a shrunk directory, column-pruned reads, and agreement
  * with the batch reader on the real driver fixtures.
  */
class RowGroupStreamSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** n rows in `files` parquet files (one row group each at this size). */
  private def writeCorpus(dir: String, n: Int, files: Int): Unit = {
    spark.range(0, n, 1, files)
      .select(col("id"), (col("id") * 3 % 97).cast("double").as("v"),
        concat(lit("doc-"), col("id")).as("tag"))
      .write.mode("overwrite").parquet(dir)
    // drop _SUCCESS etc. is unnecessary: discovery filters to *.parquet
  }

  /** Drain the stream with AvailableNow, collecting each micro-batch. */
  private def drain(stream: DataFrame, checkpoint: String): Seq[(Long, Seq[Row])] = {
    val batches = mutable.ArrayBuffer.empty[(Long, Seq[Row])]
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        batches.synchronized { batches += ((id, b.collect().toSeq)): Unit }
      }
      .start()
    q.awaitTermination()
    batches.toSeq
  }

  private def read(dir: String, opts: (String, String)*): DataFrame = {
    val r = spark.readStream.format("graft-rowgroups").option("path", dir)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("group-limited admission: 4 files drain as 4 exactly-once batches") {
    val dir = tmpDir("rg_corpus")
    writeCorpus(dir, 1000, files = 4)
    val batches = drain(read(dir, "maxRowGroupsPerTrigger" -> "1"), tmpDir("rg_ck"))
    assert(batches.length == 4, s"expected 4 batches, got ${batches.length}")
    val all = batches.flatMap(_._2)
    assert(all.length == 1000)
    assert(all.map(_.getLong(0)).toSet == (0L until 1000L).toSet) // no dup, no loss
    // every batch is exactly one slice (one file's single row group)
    assert(batches.forall(_._2.length == 250))
  }

  test("row-budget admission packs whole slices up to the budget") {
    val dir = tmpDir("rg_rows")
    writeCorpus(dir, 1000, files = 4) // slices of 250 rows
    val batches = drain(read(dir, "maxRowsPerTrigger" -> "500"), tmpDir("rg_ck"))
    assert(batches.length == 2, s"expected 2 batches of 2 slices, got ${batches.length}")
    assert(batches.forall(_._2.length == 500))
  }

  test("a slice larger than the row budget is still admitted alone") {
    val dir = tmpDir("rg_big")
    writeCorpus(dir, 900, files = 3) // 300-row slices vs 100-row budget
    val batches = drain(read(dir, "maxRowsPerTrigger" -> "100"), tmpDir("rg_ck"))
    assert(batches.length == 3) // one indivisible slice per batch, no stall
    assert(batches.flatMap(_._2).length == 900)
  }

  test("checkpoint resume: a second run over a drained stream adds nothing") {
    val dir = tmpDir("rg_resume")
    writeCorpus(dir, 400, files = 2)
    val ck = tmpDir("rg_ck")
    val first = drain(read(dir, "maxRowGroupsPerTrigger" -> "1"), ck)
    assert(first.flatMap(_._2).length == 400)
    val second = drain(read(dir, "maxRowGroupsPerTrigger" -> "1"), ck)
    assert(second.flatMap(_._2).isEmpty,
      s"drained stream replayed ${second.flatMap(_._2).length} rows")
  }

  test("a directory that shrank under a live checkpoint fails loudly") {
    val dir = tmpDir("rg_shrink")
    writeCorpus(dir, 400, files = 4)
    val ck = tmpDir("rg_ck")
    drain(read(dir), ck)
    // remove data files, keep the checkpoint pointing past the end
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .take(2).foreach(f => assert(f.delete()))
    val ex = intercept[Exception] { drain(read(dir), ck) }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("directory shrank")))
  }

  test("column pruning yields the projected columns with correct values") {
    val dir = tmpDir("rg_prune")
    writeCorpus(dir, 100, files = 1)
    val batches = drain(read(dir).select("tag"), tmpDir("rg_ck"))
    val tags = batches.flatMap(_._2).map(_.getString(0)).toSet
    assert(tags == (0 until 100).map(i => s"doc-$i").toSet)
  }

  test("agrees with the batch reader on the real events fixture (NTZ ts)") {
    assume(new java.io.File(s"$sfDir/events.parquet").isFile)
    val streamed = drain(
      read(s"$sfDir/events.parquet").select("event_id", "ts", "value"),
      tmpDir("rg_ck")).flatMap(_._2)
    val batch = graft.sources.Tables(spark, sfDir, "events")
      .select("event_id", "ts", "value").collect().toSeq
    assert(streamed.map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet ==
      batch.map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet)
  }

  test("a file added that sorts before existing ones fails loudly") {
    val dir = tmpDir("rg_shift")
    writeCorpus(dir, 200, files = 2)
    // rename data files so there is headroom BEFORE them in sort order
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (f, i) =>
        assert(f.renameTo(new java.io.File(dir, s"m$i.parquet")))
      }
    val ck = tmpDir("rg_ck")
    drain(read(dir), ck)
    // an "earlier" file appears: every slice index silently shifts by one
    val stage = tmpDir("rg_stage")
    spark.range(0, 50).select(col("id"), lit(0.0).as("v"), lit("x").as("tag"))
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val staged = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(staged.toPath,
      new java.io.File(dir, "a_first.parquet").toPath)
    val ex = intercept[Exception] { drain(read(dir), ck) }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("sorts before existing")))
  }

  test("crash between version move and CURRENT flip does not wedge replay") {
    import spark.implicits._
    val root = tmpDir("orphan_tbl") + "/t"
    val b0 = (0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "body")
    assert(EpochLedger.exactlyOnceUpsert(spark, root, b0, epochId = 0L))
    val cur = graft.reddit.PostsTable.currentVersion(root).get
    // simulate the crash window: the next version dir landed, CURRENT did
    // not flip — the replayed epoch must clobber the orphan, not wedge
    val orphan = java.nio.file.Paths.get(root, s"v_${cur + 1}")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("junk.parquet"), "corpse")
    val b1 = (5 until 15).map(i => (i.toLong, s"n$i")).toDF("id", "body")
    assert(EpochLedger.exactlyOnceUpsert(spark, root, b1, epochId = 1L))
    assert(graft.reddit.PostsTable.currentVersion(root).get == cur + 1)
    assert(graft.reddit.PostsTable.read(spark, root).count() == 15)
  }

  test("a plain upsert between ledgered epochs carries the ledger forward") {
    import spark.implicits._
    val root = tmpDir("carry_tbl") + "/t"
    def batch(ids: Range, tag: String): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, s"$tag$i")).toDF("id", "body")
    assert(EpochLedger.exactlyOnceUpsert(spark, root, batch(0 until 10, "a"), 0L))
    // manual backfill through the PLAIN path — knows nothing of the ledger
    graft.reddit.PostsTable.upsert(spark, root, batch(100 until 110, "m"))
    assert(EpochLedger.committed(root) == Map(0L -> 10L),
      "plain upsert erased the epoch ledger")
    // replay of epoch 0 must STILL be skipped after the interleaved upsert
    assert(!EpochLedger.exactlyOnceUpsert(spark, root, batch(0 until 10, "a"), 0L))
  }

  test("epoch ledger: replayed epoch is skipped, metrics commit with data") {
    import spark.implicits._
    val root = tmpDir("ledger_tbl") + "/t"
    def batch(ids: Range): DataFrame = ids.map(i => (i.toLong, s"r$i")).toDF("id", "body")
    assert(EpochLedger.exactlyOnceUpsert(spark, root, batch(0 until 10), epochId = 0L))
    val v0 = graft.reddit.PostsTable.currentVersion(root).get
    // replay of epoch 0 — skipped, no version bump, ledger unchanged
    assert(!EpochLedger.exactlyOnceUpsert(spark, root, batch(0 until 10), epochId = 0L))
    assert(graft.reddit.PostsTable.currentVersion(root).get == v0)
    // fresh epoch applies (overlapping keys upsert, new keys insert)
    assert(EpochLedger.exactlyOnceUpsert(spark, root, batch(5 until 15), epochId = 1L))
    assert(graft.reddit.PostsTable.read(spark, root).count() == 15)
    val m = EpochLedger.metrics(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(0L -> 10L, 1L -> 10L))
  }

  test("exactly-once sink: re-running a drained stream never re-upserts") {
    val dir = tmpDir("rg_e2e")
    writeCorpus(dir, 300, files = 3)
    val ck = tmpDir("rg_ck")
    val root = tmpDir("rg_tbl") + "/t"
    def run(): Unit = {
      val q = Streams.exactlyOnceUpsertSink(
        read(dir, "maxRowGroupsPerTrigger" -> "1"), root, key = "id",
        checkpoint = ck).start()
      q.awaitTermination()
    }
    run()
    val versions1 = graft.reddit.PostsTable.currentVersion(root).get
    assert(graft.reddit.PostsTable.read(spark, root).count() == 300)
    assert(EpochLedger.metrics(spark, root).count() == 3)
    run() // fully drained: no batches, no ledger growth, no version bump
    assert(graft.reddit.PostsTable.currentVersion(root).get == versions1)
    assert(EpochLedger.metrics(spark, root).count() == 3)
  }
}
