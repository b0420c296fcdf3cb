package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class OrcSpec extends SparkTestBase {
  import spark.implicits._

  test("round-trip preserves values, nulls, and unicode through zstd ORC") {
    val rows = Seq(
      (1L, Option("plain ascii"), Option(1.5)),
      (2L, Option("quote \" backslash \\ tab\t newline\n done"), None),
      (3L, Option("unicode: café 中文 😀"), Option(-0.0)),
      (4L, None, Option(2.0))
    ).toDF("id", "text", "score")
    val path = Files.createTempDirectory("orc_rt").toString
    Orc.write(rows, path)
    val back = Orc.read(spark, path, rows.schema)
    assert(back.count() == 4)
    assert(back.exceptAll(rows).isEmpty && rows.exceptAll(back).isEmpty)
    // the shards really are zstd ORC, not fallback parquet
    val files = new java.io.File(path).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".orc")), files.mkString(", "))
  }

  test("read rejects schema drift at the boundary: missing column fails loudly") {
    val df = Seq((1L, "x")).toDF("id", "text")
    val path = Files.createTempDirectory("orc_drift").toString
    Orc.write(df, path)
    val wider = df.schema.add("extra", org.apache.spark.sql.types.DoubleType)
    val ex = intercept[IllegalArgumentException](Orc.read(spark, path, wider))
    assert(ex.getMessage.contains("extra"), ex.getMessage)
  }

  test("filters push into the ORC scan") {
    val df = (1L to 1000L).map(i => (i, s"doc$i")).toDF("id", "text")
    val path = Files.createTempDirectory("orc_push").toString
    Orc.write(df, path)
    val q = Orc.read(spark, path, df.schema).filter(col("id") === 7L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(id,7"),
      s"filter not pushed into ORC scan:\n$plan")
    assert(q.count() == 1)
  }

  test("real documents table survives the ORC boundary md5-for-md5") {
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val path = Files.createTempDirectory("orc_docs").toString
    Orc.write(docs, path)
    val back = Orc.read(spark, path, docs.schema)
    val a = docs.select(col("doc_id"), md5(col("text").cast("binary")).as("m"))
    val b = back.select(col("doc_id"), md5(col("text").cast("binary")).as("m"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
