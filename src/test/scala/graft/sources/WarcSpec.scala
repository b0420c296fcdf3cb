package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** WARC source/sink: byte-exact round trip incl. CRLF-bearing payloads,
  * strict-grammar rejection of every malformation class, shard layout as
  * the parallelism contract, and the header normalization rules.
  */
class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def record(id: String, payload: String,
                     extra: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Record-ID: $id\r\n" +
      extra + s"Content-Length: ${payload.getBytes(UTF_8).length}\r\n\r\n" +
      payload + "\r\n\r\n"

  test("round trip: payload bytes survive exactly, incl. CRLF and empty payloads") {
    val docs = Seq(
      (1L, "plain text"),
      (2L, "line one\r\nline two\nWARC/1.0\r\nContent-Length: 99"), // framing bait
      (3L, "")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("warc_rt").toString
    Warc.write(docs.select(
      concat(lit("urn:graft:doc:"), col("doc_id")).as("record_id"),
      col("text").cast("binary").as("payload"),
      col("doc_id").cast("string").as("orig")), dir, shards = 2)
    val back = Warc.read(spark, dir)
      .select(col("record_id"), col("payload").cast("string").as("text"),
        col("headers")("x-graft-orig").as("orig"),
        col("warc_type"), col("target_uri"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    // the id 2 payload CONTAINS a fake record header — Content-Length
    // framing must carry the reader straight over it
    assert(back == Set(
      ("urn:graft:doc:1", "plain text", "1", "resource", null),
      ("urn:graft:doc:2", "line one\r\nline two\nWARC/1.0\r\nContent-Length: 99", "2", "resource", null),
      ("urn:graft:doc:3", "", "3", "resource", null)))
    // shard count IS the read-parallelism contract
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc")) == 2)
  }

  test("gzip path: .warc.gz round-trips identically, one file per shard, provenance marked") {
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("warc_gz").toString
    Warc.write(docs.select(
      concat(lit("urn:graft:doc:"), col("doc_id")).as("record_id"),
      col("text").cast("binary").as("payload")), dir, shards = 2, gzip = true)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".warc.gz")) == 2)
    val back = Warc.read(spark, dir)
      .select(col("record_id"), col("payload").cast("string").as("text"),
        col("source_file"))
      .collect()
    assert(back.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("urn:graft:doc:1", "alpha"), ("urn:graft:doc:2", "beta"),
        ("urn:graft:doc:3", "gamma")))
    assert(back.forall(_.getString(2).endsWith(".warc.gz")))
  }

  test("strict grammar: every malformation class is rejected, none resynchronized") {
    def parse(s: String) =
      Warc.parseAll(new ByteArrayInputStream(s.getBytes(UTF_8)), "t")
    // well-formed baseline, multi-record
    val ok = parse(record("a", "xy") + record("b", "z"))
    assert(ok.map(_.recordId) == Vector("a", "b") &&
      ok.map(r => new String(r.payload, UTF_8)) == Vector("xy", "z"))
    // version line
    intercept[IllegalArgumentException](parse("WARC/2.0\r\n\r\n"))
    // truncated payload
    intercept[IllegalArgumentException](
      parse("WARC/1.0\r\nWARC-Record-ID: a\r\nContent-Length: 10\r\n\r\nshort"))
    // missing Content-Length / non-numeric Content-Length
    intercept[IllegalArgumentException](
      parse("WARC/1.0\r\nWARC-Record-ID: a\r\n\r\n"))
    intercept[IllegalArgumentException](
      parse("WARC/1.0\r\nWARC-Record-ID: a\r\nContent-Length: ten\r\n\r\n"))
    // missing record separator after the payload
    intercept[IllegalArgumentException](
      parse("WARC/1.0\r\nWARC-Record-ID: a\r\nContent-Length: 2\r\n\r\nxy"))
    // bare LF line ending and malformed header line
    intercept[IllegalArgumentException](parse("WARC/1.0\nWARC-Record-ID: a\r\n"))
    intercept[IllegalArgumentException](
      parse("WARC/1.0\r\nnot-a-header\r\n\r\n"))
    // missing record id
    intercept[IllegalArgumentException](
      parse("WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"))
  }

  test("httpBodyText: first-terminator split; headerless payloads yield NULL") {
    val rows = Seq(
      (1L, "HTTP/1.1 200 OK\r\nX: y\r\n\r\nplain body"),
      (2L, "HTTP/1.1 200 OK\r\n\r\nbody with\r\n\r\nits own blank line"),
      (3L, "HTTP/1.1 200 OK\r\n\r\n"),
      (4L, "no terminator at all")).toDF("id", "p")
      .select(col("id"), Warc.httpBodyText(col("p").cast("binary")).as("b"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows(1L) == "plain body")
    assert(rows(2L) == "body with\r\n\r\nits own blank line",
      "a terminator inside the body must not shift the cut")
    assert(rows(3L) == "")
    assert(rows(4L) == null)
  }

  test("header names case-fold on read; CRLF in header values refused at write") {
    val rec = "WARC/1.1\r\nwarc-record-id: X\r\nWARC-TYPE: response\r\n" +
      "X-Graft-k: v\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    val r = Warc.parseAll(new ByteArrayInputStream(rec.getBytes(UTF_8)), "t").head
    assert(r.recordId == "X" && r.warcType == "response" &&
      r.headers("x-graft-k") == "v")
    val dir = Files.createTempDirectory("warc_bad").toString
    val bad = Seq(("id1", "evil\r\nInjected: yes")).toDF("record_id", "note")
      .select(col("record_id"), lit(Array[Byte]()).as("payload"), col("note"))
    val ex = intercept[Exception](Warc.write(bad, dir, shards = 1))
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: chain(t.getCause)
    assert(chain(ex).exists(_.contains("CR/LF")), chain(ex).mkString(" | "))
  }
}
