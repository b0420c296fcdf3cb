package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world", 11L),
    (2L, "abc", 3L)).toDF("doc_id", "text", "n_chars")

  test("withMedia: binary payload + deterministic metadata") {
    val rows = Multimodal.withMedia(docs).orderBy("doc_id").collect()
    assert(rows(0).getAs[Array[Byte]]("media").toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(rows(0).getAs[Long]("media_bytes") == 11L)
    assert(rows(0).getAs[Long]("width") == 16 + 11 % 64)
    assert(rows(1).getAs[String]("format") == "png") // 3 % 3 == 0
  }

  test("decodeFeatures: mapPartitions decode is deterministic and distributed") {
    val out = Multimodal.decodeFeatures(Multimodal.withMedia(docs))
    val feats = out.collect().map(d => d.doc_id -> d.features).toMap
    assert(feats(1L).length == Multimodal.FakeCodec.FeatureDim)
    // fake codec: sum of byte values scaled — deterministic
    assert(feats(2L).sum > 0.0f)
    assert(feats(2L).toSeq == Multimodal.FakeCodec.decode("abc".getBytes("UTF-8")).toSeq)
  }

  test("resize: aspect-preserving box fit, payload stub shrinks with area") {
    val rows = Multimodal.resize(Multimodal.withMedia(docs), maxW = 10, maxH = 10)
      .orderBy("doc_id").collect()
    val r = rows(0) // width 16+11%64=27, height 16+11%48=27 → scale 10/27
    assert(r.getAs[Long]("out_width") == 10L && r.getAs[Long]("out_height") == 10L)
    assert(r.getAs[Array[Byte]]("out_media").length < r.getAs[Long]("media_bytes"))
  }

  test("sampleFrames: n fixed-size windows per blob, in-row") {
    val rows = Multimodal.sampleFrames(Multimodal.withMedia(docs), n = 3, frameBytes = 4)
      .select("doc_id", "frames").orderBy("doc_id").collect()
    val frames = rows(0).getSeq[Array[Byte]](1)
    assert(frames.length == 3)
    assert(new String(frames.head, "UTF-8") == "hell")
  }
}
