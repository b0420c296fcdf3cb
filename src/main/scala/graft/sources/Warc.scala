package graft.sources

import java.io.{DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500 / WARC 1.0) reader + writer with zero non-JDK
  * dependencies — the container format of web-crawl training corpora
  * (Common Crawl ships as WARC), done the [[JsonLines]] way: explicit
  * record grammar, loud failure on malformation, and the parallelism
  * trade-off stated instead of hidden.
  *
  * Record grammar (the subset this engine writes and strictly reads):
  * `WARC/1.0\r\n`, header lines `Name: value\r\n` (names
  * case-insensitive, stored lowercased; values CRLF-free), a blank line,
  * exactly `Content-Length` payload bytes, then the mandatory
  * `\r\n\r\n` record separator. Anything else — missing version line,
  * non-numeric/absent Content-Length, truncated payload, missing
  * separator — raises IllegalArgumentException naming the file: a
  * mis-framed record would silently desynchronize every later record in
  * the file, which is the one failure mode an archive reader must not
  * have.
  *
  * Parallelism contract: a WARC file is a byte-stream of variable-length
  * records with no sync markers, so (like gzip JSONL —
  * `JsonLines.writeGzip`) ONE FILE = ONE TASK. Shard count at write time
  * IS downstream read parallelism; `write(shards = …)` makes that
  * explicit. At 100 TB you size shards to the cluster, exactly like
  * non-splittable `.gz` shards.
  *
  * Reference behavior anchor: the reference ships reddit posts as flat
  * CSV (reddit-ETL-Pipeline/airflow/extraction/extract-from-reddit.py);
  * WARC is the archival container the same pipeline meets when its
  * source is a web crawl instead of an API.
  */
object Warc {

  private val CRLF = "\r\n".getBytes(UTF_8)

  /** One parsed record: the WARC named headers this engine round-trips,
    * the full (lowercased-name) header map, and the raw payload bytes.
    */
  final case class WarcRecord(recordId: String, warcType: String,
                              targetUri: String, headers: Map[String, String],
                              payload: Array[Byte])

  // ---- write ---------------------------------------------------------------

  /** Write `df` as `shards` WARC files under `path` (`part-NNNNN.warc`).
    * Expected columns: `record_id` (non-null string), `warc_type`,
    * `target_uri`, `payload` (non-null binary), plus OPTIONAL extra
    * string columns emitted as `X-Graft-<name>` headers (nulls omitted).
    * Header values must be CRLF-free — enforced, because a CRLF inside a
    * value breaks the record grammar for every subsequent record.
    *
    * Each task streams its shard straight to the filesystem (records
    * never accumulate in task memory) and overwrites on retry, so a
    * re-executed task converges to the same bytes.
    */
  def write(df: DataFrame, path: String, shards: Int,
            gzip: Boolean = false): Unit = {
    require(shards > 0, s"warc write: shards must be > 0, got $shards")
    val cols = df.columns
    require(Set("record_id", "payload").subsetOf(cols.toSet),
      s"warc write: need record_id + payload columns, got ${cols.mkString(",")}")
    val extra = cols.filterNot(Set("record_id", "warc_type", "target_uri", "payload"))
    val planCols =
      Seq(col("record_id").cast("string").as("record_id"),
        (if (cols.contains("warc_type")) col("warc_type") else lit("resource"))
          .cast("string").as("warc_type"),
        (if (cols.contains("target_uri")) col("target_uri") else lit(null))
          .cast("string").as("target_uri"),
        col("payload").cast("binary").as("payload")) ++
        extra.map(c => col(c).cast("string").as(c))
    val plan = df.select(planCols: _*)
    val pathStr = path
    plan.repartition(shards).rdd.mapPartitionsWithIndex { (idx, rows) =>
      // executor-side Hadoop conf: on a real cluster core-site rides the
      // executor classpath; locally this resolves file://
      val fs = new org.apache.hadoop.fs.Path(pathStr)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.mkdirs(new org.apache.hadoop.fs.Path(pathStr))
      val suffix = if (gzip) ".warc.gz" else ".warc"
      val file = new org.apache.hadoop.fs.Path(pathStr, f"part-$idx%05d$suffix")
      // attempt-unique temp + rename-on-close: two attempts of one
      // partition (retry, speculation) can never interleave bytes in the
      // live file — each writes its own temp, the rename publishes whole
      // shards only, and a later attempt's rename-over replaces, not mixes
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val tmp = new org.apache.hadoop.fs.Path(pathStr,
        f".part-$idx%05d$suffix.inprogress-$attempt")
      val out: java.io.OutputStream =
        if (gzip) new java.util.zip.GZIPOutputStream(fs.create(tmp, true))
        else fs.create(tmp, true)
      var n = 0L
      rows.foreach { r =>
        val id = r.getString(0)
        require(id != null, "warc write: null record_id")
        val payload = r.getAs[Array[Byte]]("payload")
        require(payload != null, s"warc write: null payload for record '$id'")
        def hdr(name: String, value: String): Unit = {
          require(!value.exists(c => c == '\r' || c == '\n'),
            s"warc write: header $name of record '$id' contains CR/LF")
          out.write(s"$name: $value".getBytes(UTF_8)); out.write(CRLF)
        }
        out.write("WARC/1.0".getBytes(UTF_8)); out.write(CRLF)
        hdr("WARC-Type", Option(r.getString(1)).getOrElse("resource"))
        hdr("WARC-Record-ID", id)
        // mandatory per spec; fixed instant keeps shards byte-deterministic
        hdr("WARC-Date", "2024-01-01T00:00:00Z")
        if (!r.isNullAt(2)) hdr("WARC-Target-URI", r.getString(2))
        extra.foreach { c =>
          val v = r.getAs[String](c)
          if (v != null) hdr(s"X-Graft-$c", v)
        }
        hdr("Content-Length", payload.length.toString)
        out.write(CRLF)
        out.write(payload)
        out.write(CRLF); out.write(CRLF)
        n += 1
      }
      out.close()
      fs.delete(file, false)
      require(fs.rename(tmp, file),
        s"warc write: could not publish $tmp as $file")
      Iterator.single(n)
    }.count(): Unit
  }

  // ---- read ----------------------------------------------------------------

  private val readSchema = StructType(Seq(
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("payload", BinaryType),
    // which shard file carried the record — binaryFiles-based reads don't
    // get input_file_name(), and audits (the gzip-path proof, skew checks)
    // need the provenance
    StructField("source_file", StringType)))

  /** Read every `.warc` and `.warc.gz` file under `path` (codec picked by
    * extension, like [[JsonLines]]'s gzip path — Common Crawl ships
    * `.warc.gz`). One file = one task either way (WARC has no sync
    * markers; gzip is additionally non-splittable); any malformed record
    * fails the task loudly, naming the file.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(s"$path/*.warc*")
      .filter { case (f, _) => f.endsWith(".warc") || f.endsWith(".warc.gz") }
      .flatMap { case (file, pds) =>
        val raw: InputStream =
          if (file.endsWith(".gz")) new java.util.zip.GZIPInputStream(pds.open())
          else pds.open()
        val in = new DataInputStream(raw)
        try parseAll(in, file).iterator.map(r => (file, r))
        finally in.close()
      }
      .map { case (file, r) => Row(r.recordId, r.warcType, r.targetUri,
        r.headers, r.payload, file) }
    spark.createDataFrame(rows, readSchema)
  }

  /** Parse records until EOF. Strict: every deviation from the grammar
    * throws rather than resynchronizing (see the object doc).
    */
  private[sources] def parseAll(in: InputStream, file: String): Vector[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var first = readLine(in)
    while (first != null) {
      require(first == "WARC/1.0" || first == "WARC/1.1",
        s"warc $file: expected a WARC version line, got '$first'")
      var headers = Map.empty[String, String]
      var line = readLine(in)
      while (line != null && line.nonEmpty) {
        val i = line.indexOf(':')
        require(i > 0, s"warc $file: malformed header line '$line'")
        headers += (line.substring(0, i).trim.toLowerCase ->
          line.substring(i + 1).trim)
        line = readLine(in)
      }
      require(line != null, s"warc $file: EOF inside a header block")
      val len = headers.getOrElse("content-length",
        throw new IllegalArgumentException(s"warc $file: record without Content-Length"))
      val n = try len.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"warc $file: non-numeric Content-Length '$len'")
      }
      require(n >= 0 && n <= Int.MaxValue - 8,
        s"warc $file: implausible Content-Length $n")
      val payload = new Array[Byte](n.toInt)
      try new DataInputStream(in).readFully(payload) catch {
        case _: EOFException => throw new IllegalArgumentException(
          s"warc $file: payload truncated (declared $n bytes)")
      }
      val sep1 = readLine(in)
      val sep2 = readLine(in)
      require(sep1 != null && sep1.isEmpty && sep2 != null && sep2.isEmpty,
        s"warc $file: record separator missing after payload")
      out += WarcRecord(
        headers.getOrElse("warc-record-id",
          throw new IllegalArgumentException(s"warc $file: record without WARC-Record-ID")),
        headers.getOrElse("warc-type", "resource"),
        headers.getOrElse("warc-target-uri", null),
        headers, payload)
      first = readLine(in)
    }
    out.result()
  }

  /** Extract the BODY of a text HTTP response carried in a WARC
    * `response` record (ISO 28500 §6.3: the record content is the full
    * HTTP message, status line + headers + body): everything after the
    * first CRLFCRLF. The Common Crawl processing step between "read the
    * archive" and "curate the text", as a plain column expression —
    * composes with [[read]] on the scan, zero shuffle, codegen'd.
    *
    * Text scope, stated: the payload is decoded as UTF-8, which is exact
    * for the text responses this step exists to harvest; binary bodies
    * (images etc.) are not round-trippable through a string column and
    * belong to the media pipeline, not this extractor. A payload with no
    * header terminator yields NULL — treating a truncated header block as
    * body would silently feed HTTP headers into the text pipeline.
    */
  def httpBodyText(payload: Column): Column = {
    val s = payload.cast("string")
    val at = locate("\r\n\r\n", s)
    when(at > 0, s.substr(at + 4, length(s))).otherwise(lit(null).cast("string"))
  }

  /** Read one CRLF-terminated line as UTF-8, null at EOF. A bare LF or a
    * CR not followed by LF is a grammar violation, not a tolerated
    * variant — mis-framing desynchronizes the stream.
    */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream()
    var b = in.read()
    if (b < 0) return null
    while (b != '\r') {
      require(b != '\n', "warc: bare LF inside a line")
      buf.write(b)
      b = in.read()
      require(b >= 0, "warc: EOF inside a line")
    }
    require(in.read() == '\n', "warc: CR not followed by LF")
    new String(buf.toByteArray, UTF_8)
  }
}
