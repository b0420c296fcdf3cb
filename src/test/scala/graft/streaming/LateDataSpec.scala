package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Pins the Spark late-data contract q_stream_late_data builds on:
  * the late-event filter uses the PREVIOUS batch's watermark while
  * eviction uses the updated one (SPARK-40925), so a row is only dropped
  * as late once a FURTHER batch has run after the watermark-raising one.
  */
class LateDataSpec extends SparkTestBase {
  import spark.implicits._

  private def drain(stageRows: Seq[Seq[(String, Double, String)]]): (Array[org.apache.spark.sql.Row], Long) = {
    val inDir = Files.createTempDirectory("late_in").toString
    val outDir = Files.createTempDirectory("late_out").toString + "/out"
    val ckpt = Files.createTempDirectory("late_ck").toString
    stageRows.zipWithIndex.foreach { case (rows, i) =>
      val stageDir = Files.createTempDirectory("late_st").toString
      rows.toDF("event_type", "value", "s")
        .select(col("event_type"), col("value"), col("s").cast("timestamp").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(stageDir)
      val part = new java.io.File(stageDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = Paths.get(inDir, s"batch$i.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 60000L)): Unit
    }
    val schema = new org.apache.spark.sql.types.StructType()
      .add("event_type", "string").add("value", "double").add("ts", "timestamp")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = Streams.hourlyCounts(stream, "ts", "10 seconds")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val dropped = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    (spark.read.parquet(outDir).collect(), dropped)
  }

  test("late row one batch after the watermark raiser is NOT yet dropped (lagged filter)") {
    val (out, dropped) = drain(Seq(
      Seq(("a", 1.0, "2024-01-01 10:00:30")),
      Seq(("b", 1.0, "2024-01-01 08:00:10")), // late vs wm, but filter still at epoch
      Seq(("f", 0.0, "2024-03-01 00:00:00"))))
    assert(out.exists(_.getAs[String]("event_type") == "b"),
      s"lagged late filter dropped too early: ${out.mkString("; ")}")
    assert(dropped == 0L)
  }

  test("late row two batches after the watermark raiser IS dropped") {
    val (out, dropped) = drain(Seq(
      Seq(("a", 1.0, "2024-01-01 10:00:30")),
      Seq(("n", 1.0, "2024-01-01 10:30:00")), // nudge: previous wm becomes active
      Seq(("b", 1.0, "2024-01-01 08:00:10")), // window end 09:00 <= wm 10:00:20
      Seq(("k", 1.0, "2024-01-01 10:10:00")), // same batch, window end above wm
      Seq(("f", 0.0, "2024-03-01 00:00:00"))))
    assert(out.exists(_.getAs[String]("event_type") == "a"))
    assert(out.exists(_.getAs[String]("event_type") == "k"))
    assert(!out.exists(_.getAs[String]("event_type") == "b"),
      s"late row survived the watermark filter: ${out.mkString("; ")}")
    assert(dropped == 1L, s"expected exactly the late row dropped, got $dropped")
  }
}
