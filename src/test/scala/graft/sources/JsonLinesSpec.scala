package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

class JsonLinesSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("score", DoubleType)))

  test("round-trip preserves values, nulls, unicode, and escapes") {
    val rows = Seq(
      (1L, Option("plain ascii"), Option(1.5)),
      (2L, Option("quote \" backslash \\ tab\t newline\n done"), None),
      (3L, Option("unicode: café 中文 😀"), Option(-0.0)),
      (4L, None, Option(2.0))
    ).toDF("id", "text", "score")
    val path = Files.createTempDirectory("jsonl_rt").toString
    JsonLines.write(rows, path)
    val back = JsonLines.readClean(spark, path, rows.schema)
    assert(back.count() == 4)
    assert(back.exceptAll(rows).isEmpty && rows.exceptAll(back).isEmpty)
  }

  test("malformed lines are quarantined, clean rows survive") {
    val dir = Files.createTempDirectory("jsonl_bad")
    Files.writeString(dir.resolve("part-000.json"),
      """{"id": 1, "text": "good", "score": 1.0}
        |this is not json at all
        |{"id": "NOT_A_NUMBER", "text": "type clash", "score": 2.0}
        |{"id": 3, "text": "also good", "score": 3.0}
        |""".stripMargin)
    val clean = JsonLines.readClean(spark, dir.toString, schema)
    assert(clean.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val bad = JsonLines.badRecords(spark, dir.toString, schema).as[String].collect()
    assert(bad.length == 2)
    assert(bad.exists(_.contains("not json")))
    assert(bad.exists(_.contains("NOT_A_NUMBER")))
  }

  test("gzip round-trip: .json.gz shards, values/nulls/unicode intact, bad lines quarantined") {
    val rows = Seq(
      (1L, Option("plain ascii"), Option(1.5)),
      (2L, Option("quote \" backslash \\ tab\t newline\n done"), None),
      (3L, Option("unicode: café 中文 😀"), Option(-0.0)),
      (4L, None, Option(2.0))
    ).toDF("id", "text", "score")
    val path = Files.createTempDirectory("jsonl_gz").toString
    JsonLines.writeGzip(rows, path)
    // every data file is gzip — the write really compressed
    val files = new java.io.File(path).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".json.gz")))
    val back = JsonLines.readClean(spark, path, rows.schema)
    assert(back.count() == 4)
    assert(back.exceptAll(rows).isEmpty && rows.exceptAll(back).isEmpty)
    // the diagnostics path decompresses by extension too
    val dir = Files.createTempDirectory("jsonl_gz_bad")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("part-000.json.gz")))
    gz.write("{\"id\": 1, \"text\": \"good\", \"score\": 1.0}\nnot json\n".getBytes("UTF-8"))
    gz.close()
    assert(JsonLines.readClean(spark, dir.toString, schema).count() == 1)
    assert(JsonLines.badRecords(spark, dir.toString, schema).as[String].collect()
      .toSeq == Seq("not json"))
  }

  test("gzip is not splittable: one big .gz file reads as one task") {
    val path = Files.createTempDirectory("jsonl_gz_split").toString
    JsonLines.writeGzip(spark.range(50000)
      .select(col("id"), concat(lit("doc "), col("id")).as("text"),
        col("id").cast("double").as("score")).coalesce(1), path)
    val one = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try {
      // the documented tradeoff, measured: same data that splits into >4
      // tasks as plain JSONL pins to exactly 1 task as a single .gz stream
      val parts = JsonLines.readClean(spark, path, schema).rdd.getNumPartitions
      assert(parts == 1, s"one .gz file must be one task, got $parts")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", one)
  }

  test("reads are splittable: many tasks for one big file, no multiLine pinning") {
    val path = Files.createTempDirectory("jsonl_split").toString
    spark.range(50000)
      .select(col("id"), concat(lit("doc "), col("id")).as("text"),
        col("id").cast("double").as("score"))
      .coalesce(1).write.mode("overwrite").json(path)
    val one = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try {
      val parts = JsonLines.readClean(spark, path, schema).rdd.getNumPartitions
      assert(parts > 4, s"single-file JSONL read did not split: $parts partitions")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", one)
  }
}
