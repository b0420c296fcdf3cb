package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with a typed metadata struct, the way a
  * large-scale training-data pipeline ships media next to text.
  *
  * The Spark-side plumbing (schema, batch iteration shape, partitioning) is
  * real; the *codec* is a deterministic stub ([[FakeCodec]]) because no
  * image/audio library ships in this environment. Swapping in a real decoder
  * is a one-function change with the same `Iterator`-batch signature a
  * vectorized (Arrow/pandas-style) UDF would have.
  *
  * Scale shape: decode is embarrassingly parallel (`mapPartitions`, no
  * shuffle); metadata extraction is pure column arithmetic inside
  * whole-stage codegen; frame sampling never materializes more than the
  * requested frames per row.
  */
object Multimodal {

  /** Media payload schema: the binary blob plus typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_bytes", LongType, nullable = true),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("format", StringType, nullable = true)))

  /** Attach a binary media column + deterministic metadata to `documents`.
    * The payload is the UTF-8 bytes of `text` (a stand-in blob: real
    * pipelines would read image bytes); metadata is derived arithmetically
    * from `n_chars` so the DuckDB oracle can reproduce it exactly.
    */
  def withMedia(docs: DataFrame, id: String = "doc_id", text: String = "text",
                nChars: String = "n_chars"): DataFrame =
    docs.select(
      col(id).as("doc_id"),
      col(text).cast("binary").as("media"),
      length(col(text).cast("binary")).cast("long").as("media_bytes"),
      (lit(16L) + col(nChars) % 64).as("width"),
      (lit(16L) + col(nChars) % 48).as("height"),
      when(col(nChars) % 3 === 0, "png")
        .when(col(nChars) % 3 === 1, "jpeg")
        .otherwise("webp").as("format"))

  /** Oracle-checkable projection of [[withMedia]] (binary column dropped —
    * parquet/duckdb blob hashing is engine-specific; the byte length is the
    * content check).
    */
  def mediaMeta(docs: DataFrame): DataFrame =
    withMedia(docs).select("doc_id", "media_bytes", "width", "height", "format")

  /** One decoded media record. `features` is the fixed-length embedding a
    * real codec+model would emit.
    */
  case class DecodedMedia(doc_id: Long, media_bytes: Long, format: String,
                          features: Array[Float])

  /** Deterministic stand-in codec — STUB for the real image/audio decode.
    *
    * Real deployment: replace `decode` with e.g. a JNI/codec call; the
    * signature (bytes in, fixed-length float features out) and the
    * per-partition batch loop in [[decodeFeatures]] are unchanged.
    */
  object FakeCodec {
    val FeatureDim = 8
    def decode(bytes: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) {
          f(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
      }
      f
    }
  }

  /** Decode every media blob to a feature vector. `mapPartitions` keeps the
    * decode batched per task (the Arrow-UDF execution shape) with zero
    * shuffle; at 100 TB this is a pure scan → scan job.
    */
  def decodeFeatures(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "media_bytes", "format")
      .as[(Long, Array[Byte], Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, bytes, nBytes, fmt) =>
          DecodedMedia(id, nBytes, fmt, FakeCodec.decode(bytes))
        }
      }
  }

  /** Resize stub: aspect-preserving downscale into a `maxW`×`maxH` box.
    * Output metadata is real arithmetic (what downstream partitioning and
    * batch-shape logic consume); the payload "re-encode" is the STUB —
    * bytes truncated proportionally to the area change, standing in for a
    * real codec call with the same columnar signature.
    */
  def resize(media: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    val scale = least(lit(1.0),
      least(lit(maxW) / col("width").cast("double"),
        lit(maxH) / col("height").cast("double")))
    media
      .withColumn("out_width", floor(col("width") * scale).cast("long"))
      .withColumn("out_height", floor(col("height") * scale).cast("long"))
      .withColumn("out_media",
        col("media").substr(lit(1),
          greatest((col("media_bytes") * scale * scale).cast("int"), lit(1))))
  }

  /** Frame-sample: pick `n` evenly spaced "frames" (fixed-size byte windows)
    * from each blob — the video-keyframe access pattern. In-row `transform`
    * over a `sequence`, no explode of the full frame set.
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int = 16): DataFrame =
    media.withColumn(
      "frames",
      transform(
        sequence(lit(0), lit(n - 1)),
        i => col("media").substr(
          (i * greatest((col("media_bytes") / n).cast("int"), lit(1)) + 1).cast("int"),
          lit(frameBytes))))
}
