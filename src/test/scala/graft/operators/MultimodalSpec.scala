package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world", 11L),
    (2L, "abc", 3L)).toDF("doc_id", "text", "n_chars")

  test("withMedia: header+payload blob, metadata PARSED from the bytes") {
    val rows = Multimodal.withMedia(docs).orderBy("doc_id").collect()
    // doc 1: n_chars=11 → 11%3=2 → WebP VP8X (30-byte header) + 11 payload
    val m1 = rows(0).getAs[Array[Byte]]("media")
    assert(new String(m1.take(4), "ASCII") == "RIFF")
    assert(new String(m1.slice(8, 16), "ASCII") == "WEBPVP8X")
    assert(m1.drop(30).toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(rows(0).getAs[Long]("media_bytes") == 41L)
    assert(rows(0).getAs[Long]("width") == 16 + 11 % 64)
    assert(rows(0).getAs[Long]("height") == 16 + 11 % 48)
    assert(rows(0).getAs[String]("format") == "webp")
    // doc 2: n_chars=3 → PNG (33-byte header): real signature + IHDR
    val m2 = rows(1).getAs[Array[Byte]]("media")
    assert(m2.take(8).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    assert(rows(1).getAs[Long]("media_bytes") == 36L)
    assert(rows(1).getAs[String]("format") == "png")
    assert(rows(1).getAs[Long]("width") == 16 + 3 % 64)
  }

  test("media_header: parses real-world PNG/JPEG bytes, rejects garbage") {
    // a REAL 1x1 RGBA PNG header (true CRC bytes included)
    val png1x1 = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, 0x89).map(_.toByte)
    // a JPEG whose SOF0 comes after APP0 and a COM segment (marker scan
    // must skip both), 640x480
    val jpeg = Array[Int](0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 0x4a, 0x46, 0x49, 0x46, 0x00,
      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xff, 0xfe, 0x00, 0x05, 0x68, 0x69, 0x21, // COM "hi!"
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0xe0, 0x02, 0x80,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
    // progressive JPEG: SOF2 (0xc2) must also be recognized
    val jpegProg = Array[Int](0xff, 0xd8,
      0xff, 0xc2, 0x00, 0x11, 0x08, 0x00, 0x10, 0x00, 0x20,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
    val cases = Seq(
      (1L, png1x1), (2L, jpeg), (3L, jpegProg),
      (4L, "not an image".getBytes("UTF-8")),
      (5L, Array.empty[Byte]),
      (6L, png1x1.take(20)), // truncated before the IHDR payload
      (7L, Array[Int](0xff, 0xd8, 0xff, 0xd9).map(_.toByte))) // SOI+EOI, no frame
    val out = cases.toDF("id", "bytes")
      .select(col("id"), graft.functions.media_header(col("bytes")).as("h"))
      .orderBy("id").collect()
    assert(out(0).getStruct(1).toSeq == Seq("png", 1L, 1L))
    assert(out(1).getStruct(1).toSeq == Seq("jpeg", 640L, 480L))
    assert(out(2).getStruct(1).toSeq == Seq("jpeg", 32L, 16L))
    (3 to 6).foreach(i => assert(out(i).isNullAt(1), s"case ${i + 1} should be NULL"))
    // interpreted eval agrees with the codegen'd path
    assert(graft.functions.HashUtil.mediaHeader(jpeg).toSeq(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("f", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("w", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.LongType))))
      .map(_.toString) == Seq("jpeg", "640", "480"))
    assert(graft.functions.HashUtil.mediaHeader("junk".getBytes) == null)
  }

  test("media_header parses BMP and netpbm headers from real encoded bytes") {
    val bmp = ImageCodec.encodeBmp24(5, 3, _ => 1.toByte)
    val ppm = ImageCodec.encodePpm(12, 7, _ => 1.toByte)
    val pgm = ImageCodec.encodePgm(3, 9, _ => 1.toByte)
    val weird = "P5\n#c\n 2 1\n255\n".getBytes("ASCII") ++ Array[Byte](0, 0)
    val out = Seq((1L, bmp), (2L, ppm), (3L, pgm), (4L, weird),
        (5L, bmp.take(20)), (6L, "P6 junk".getBytes("ASCII")))
      .toDF("id", "bytes")
      .select(col("id"), graft.functions.media_header(col("bytes")).as("h"))
      .orderBy("id").collect()
    assert(out(0).getStruct(1).toSeq == Seq("bmp", 5L, 3L))
    assert(out(1).getStruct(1).toSeq == Seq("ppm", 12L, 7L))
    assert(out(2).getStruct(1).toSeq == Seq("pgm", 3L, 9L))
    assert(out(3).getStruct(1).toSeq == Seq("pgm", 2L, 1L))
    assert(out(4).isNullAt(1), "truncated BMP header must be NULL")
    assert(out(5).isNullAt(1), "garbage netpbm header must be NULL")
    // top-down BMP (negative height) reports the canvas magnitude
    val neg = bmp.clone()
    val nh = -3
    neg(22) = (nh & 0xff).toByte; neg(23) = ((nh >> 8) & 0xff).toByte
    neg(24) = ((nh >> 16) & 0xff).toByte; neg(25) = ((nh >> 24) & 0xff).toByte
    assert(graft.functions.HashUtil.mediaHeader(neg).getLong(2) == 3L)
  }

  test("decodeFeatures: mapPartitions decode is deterministic and distributed") {
    val media = Multimodal.withMedia(docs)
    val out = Multimodal.decodeFeatures(media)
    val feats = out.collect().map(d => d.doc_id -> d.features).toMap
    assert(feats(1L).length == Multimodal.FakeCodec.FeatureDim)
    // fake codec over the full blob (header included) — deterministic
    val blob2 = media.filter(col("doc_id") === 2L).select("media")
      .collect().head.getAs[Array[Byte]](0)
    assert(feats(2L).sum > 0.0f)
    assert(feats(2L).toSeq == Multimodal.FakeCodec.decode(blob2).toSeq)
  }

  test("ImageCodec: BMP encode→decode is an exact inverse, padding and BGR included") {
    // w=5 → 15 pixel bytes/row, padded to 16: the padding path is live
    val w = 5; val h = 3
    val pix = (i: Int) => ((i * 11 + 3) % 256).toByte
    val blob = ImageCodec.encodeBmp24(w, h, pix)
    assert(blob.length == 54 + 16 * h) // 4-byte row padding
    val img = ImageCodec.decode(blob)
    assert((img.format, img.width, img.height, img.channels) == ("bmp", w, h, 3))
    assert(img.pixels.toSeq == (0 until w * h * 3).map(pix))
    // storage really is bottom-up BGR, not a memcpy: byte 54 of the file is
    // the BLUE channel of the BOTTOM-LEFT pixel, not logical byte 0
    assert(blob(54) == pix(((h - 1) * w + 0) * 3 + 2))
  }

  test("ImageCodec: top-down BMP (negative height) decodes to the same logical order") {
    val w = 4; val h = 2
    val pix = (i: Int) => (i * 7 % 256).toByte
    val blob = ImageCodec.encodeBmp24(w, h, pix)
    // flip to top-down: height := -h (two's complement LE at offset 22)
    // and reverse the file's row blocks so the image content is unchanged
    val neg = -h
    blob(22) = (neg & 0xff).toByte; blob(23) = ((neg >> 8) & 0xff).toByte
    blob(24) = ((neg >> 16) & 0xff).toByte; blob(25) = ((neg >> 24) & 0xff).toByte
    val rowSize = 12 // 3*4, already 4-byte aligned
    val rows = (0 until h).map(r => blob.slice(54 + r * rowSize, 54 + (r + 1) * rowSize))
    rows.reverse.zipWithIndex.foreach { case (row, r) =>
      System.arraycopy(row, 0, blob, 54 + r * rowSize, rowSize)
    }
    assert(ImageCodec.decode(blob).pixels.toSeq == (0 until w * h * 3).map(pix))
  }

  test("ImageCodec: netpbm round-trips; header comments and whitespace are tolerated") {
    val pix = (i: Int) => ((i * 13 + 1) % 256).toByte
    val ppm = ImageCodec.decode(ImageCodec.encodePpm(3, 2, pix))
    assert((ppm.format, ppm.channels) == ("ppm", 3))
    assert(ppm.pixels.toSeq == (0 until 18).map(pix))
    val pgm = ImageCodec.decode(ImageCodec.encodePgm(3, 2, pix))
    assert((pgm.format, pgm.channels) == ("pgm", 1))
    assert(pgm.pixels.toSeq == (0 until 6).map(pix))
    // hand-built header with a comment line and extra whitespace (legal
    // netpbm); raster = 2x1 gray bytes {7, 9}
    val weird = "P5\n# a comment\n  2\t1\n255\n".getBytes("ASCII") ++ Array[Byte](7, 9)
    assert(ImageCodec.decode(weird).pixels.toSeq == Seq[Byte](7, 9))
  }

  test("ImageCodec: corrupt blobs fail cleanly, never misdecode") {
    val good = ImageCodec.encodeBmp24(4, 2, _ => 1.toByte)
    intercept[IllegalArgumentException](ImageCodec.decode(good.take(40)))  // truncated header
    intercept[IllegalArgumentException](ImageCodec.decode(good.take(60)))  // truncated raster
    val badBpp = good.clone(); badBpp(28) = 8 // 8-bit palette BMP unsupported
    intercept[IllegalArgumentException](ImageCodec.decode(badBpp))
    val badComp = good.clone(); badComp(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](ImageCodec.decode(badComp))
    intercept[IllegalArgumentException](ImageCodec.decode("junk".getBytes))
    val shortPpm = ImageCodec.encodePpm(4, 2, _ => 1.toByte).dropRight(1)
    intercept[IllegalArgumentException](ImageCodec.decode(shortPpm))
    val badMaxval = "P5\n2 1\n65535\n".getBytes("ASCII") ++ Array[Byte](0, 0, 0, 0)
    intercept[IllegalArgumentException](ImageCodec.decode(badMaxval))
  }

  test("WavCodec: PCM encode→decode round-trips; chunk scan skips unknown chunks") {
    val samples = (0 until 100).map(i => ((i * 997 % 65536) - 32768).toShort)
    val wav = WavCodec.encodePcm16(16000, 100, samples(_))
    assert(wav.length == 44 + 200)
    val dec = WavCodec.decodePcm16(wav)
    assert((dec.sampleRate, dec.channels) == (16000, 1))
    assert(dec.samples.toSeq == samples)
    // splice an odd-sized LIST chunk between fmt and data: the scanner
    // must skip it including its pad byte
    val listChunk = "LIST".getBytes("ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // size 3 + pad
    val spliced = wav.take(36) ++ listChunk ++ wav.drop(36)
    // RIFF size field is now stale, but chunk scan doesn't use it
    assert(WavCodec.decodePcm16(spliced).samples.toSeq == samples)
    // corrupt cases fail loudly
    intercept[IllegalArgumentException](WavCodec.decodePcm16(wav.take(30)))
    val badFmt = wav.clone(); badFmt(20) = 3 // IEEE float format
    intercept[IllegalArgumentException](WavCodec.decodePcm16(badFmt))
    // a 'fmt ' chunk shorter than the 16-byte PCM block must refuse, not
    // read format fields out of the neighboring chunk
    val shortFmt = wav.clone(); shortFmt(16) = 8
    intercept[IllegalArgumentException](WavCodec.decodePcm16(shortFmt))
    intercept[IllegalArgumentException](WavCodec.decodePcm16("RIFFxxxxJUNK".getBytes))
  }

  test("equalizeMedia: known CDF remap, full-range stretch, constant plane to zero") {
    import spark.implicits._
    // gray 4×1 plane [10, 10, 20, 30]: cdf 10→2, 20→3, 30→4; cdfmin=2,
    // N=4 → remap 10→0, 20→(3−2)·255/2=127, 30→(4−2)·255/2=255
    val g = Array[Byte](10, 10, 20, 30)
    val pgm = ImageCodec.encodePgm(4, 1, g(_))
    // constant plane → all zero by the documented convention
    val flat = ImageCodec.encodePgm(3, 1, _ => 77.toByte)
    val out = Multimodal.equalizeMedia(
        Seq((1L, pgm), (2L, flat)).toDF("doc_id", "media"))
      .as[(Long, Array[Byte])].collect()
      .map { case (id, b) => id -> ImageCodec.decode(b).pixels.map(_ & 0xff).toSeq }
      .toMap
    assert(out(1L) == Seq(0, 0, 127, 255))
    assert(out(2L) == Seq(0, 0, 0))
  }

  test("luminanceHistogram: BT.601 integer luma, gray passthrough, bin edges") {
    import spark.implicits._
    // gray 2×1: pixels 0 and 255 → bins 0 and 7, lum_sum 255
    val g = Array[Byte](0, -1)
    val pgm = ImageCodec.encodePgm(2, 1, g(_))
    // RGB 2×1: pure red (luma 299·255/1000 = 76 → bin 2) and pure
    // white (luma 255 → bin 7)
    val rgb = Array[Byte](-1, 0, 0, -1, -1, -1)
    val ppm = ImageCodec.encodePpm(2, 1, rgb(_))
    val out = Multimodal.luminanceHistogram(
        Seq((1L, pgm), (2L, ppm)).toDF("doc_id", "media"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_px") == 2L && r1.getAs[Long]("lum_sum") == 255L)
    assert(r1.getAs[Long]("bin0") == 1L && r1.getAs[Long]("bin7") == 1L)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_px") == 2L)
    assert(r2.getAs[Long]("lum_sum") == 76L + 255L)
    assert(r2.getAs[Long]("bin2") == 1L && r2.getAs[Long]("bin7") == 1L)
  }

  test("trimSilence: leading/trailing runs drop, stereo frames stay aligned, all-silent empties") {
    import spark.implicits._
    // mono: [0 0 5 0 -9 0 0] at |s|>=5 → kept [5 0 -9]
    val m = Array[Short](0, 0, 5, 0, -9, 0, 0)
    val mono = WavCodec.encodePcm16(8000, 7, m(_))
    // stereo frames (L,R): (0,0) (0,6) (2,0) (0,0) — frame 1 is loud on R,
    // frames 2,3 are quiet on both channels → kept frames 1..1 → [0,6]
    val st = Array[Short](0, 0, 0, 6, 2, 0, 0, 0)
    val stereo = WavCodec.encodePcm16Ch(8000, 2, 8, st(_))
    val sl = Array[Short](1, -2, 3, -1)
    val silent = WavCodec.encodePcm16(8000, 4, sl(_))
    val df = Seq((1L, mono), (2L, stereo), (3L, silent)).toDF("doc_id", "media")
    val out = Multimodal.trimSilence(df, threshold = 5)
      .as[(Long, Array[Byte])].collect()
      .map { case (id, b) => id -> WavCodec.decodePcm16(b) }.toMap
    assert(out(1L).samples.toSeq == Seq[Short](5, 0, -9))
    assert(out(2L).channels == 2 && out(2L).samples.toSeq == Seq[Short](0, 6))
    assert(out(3L).samples.isEmpty)
    assert(out(3L).sampleRate == 8000) // header survives an empty trim
  }

  test("AviCodec: uncompressed AVI round-trips frame-exact; corrupt clips fail loudly") {
    // 3 frames of 5x3 (odd width → padded DIB rows), frame-dependent pixels
    val pix = (f: Int, i: Int) => ((f * 50 + i * 7) % 256).toByte
    val avi = AviCodec.encodeAvi24(5, 3, 3, fps = 10, pix)
    assert(AviCodec.isAvi(avi))
    val v = AviCodec.decodeAvi24(avi)
    assert((v.width, v.height, v.frames.length) == (5, 3, 3))
    (0 until 3).foreach { f =>
      assert(v.frames(f).toSeq == (0 until 45).map(i => pix(f, i)),
        s"frame $f mis-decoded")
    }
    // size arithmetic the oracle relies on: 224 + nf*(8 + rowSize*h)
    assert(avi.length == 224 + 3 * (8 + 16 * 3))
    intercept[IllegalArgumentException](AviCodec.decodeAvi24(avi.take(100)))
    // a frame chunk whose declared size disagrees with the strf dims must
    // refuse, not decode the next chunk's bytes as pixels
    val shortFrame = avi.clone()
    val firstDb = avi.indexOfSlice("00db".getBytes("ASCII"))
    shortFrame(firstDb + 4) = 8 // declare 8 bytes instead of rowSize*h
    intercept[IllegalArgumentException](AviCodec.decodeAvi24(shortFrame))
    val comp = avi.clone()
    // find strf's biCompression and corrupt it → must refuse, not misdecode
    val strfAt = avi.indexOfSlice("strf".getBytes("ASCII"))
    comp(strfAt + 8 + 16) = 1 // BI_RLE8
    intercept[IllegalArgumentException](AviCodec.decodeAvi24(comp))
    intercept[IllegalArgumentException](AviCodec.decodeAvi24("RIFFxxxxWAVE".getBytes))
  }

  test("AviCodec: MJPEG clips decode per-frame through JpegCodec; raw path refuses them") {
    // block-constant grayscale frames at the flat-8 quantizer → DC-only
    // blocks that round-trip bit-exact even through the lossy codec
    val (w, h) = (13, 9)
    val bw = (w + 7) / 8
    def gen(f: Int)(i: Int): Byte = {
      val x = i % w; val y = i / w
      ((13 * ((y / 8) * bw + x / 8) + 11 * f) % 256).toByte
    }
    val frames = Array.tabulate(3)(f => JpegCodec.encodeJpeg(w, h, 1, gen(f)))
    val avi = AviCodec.encodeAviMjpeg(w, h, fps = 10, frames)
    assert(AviCodec.isAvi(avi))
    val v = AviCodec.decodeAviVideo(avi)
    assert((v.width, v.height, v.frames.length) == (w, h, 3))
    (0 until 3).foreach { f =>
      val expect = (0 until w * h).flatMap(i => Seq.fill(3)(gen(f)(i)))
      assert(v.frames(f).toSeq == expect, s"MJPEG frame $f mis-decoded")
    }
    // the raw-DIB entry point must route callers, not misdecode JPEG bytes
    val ex = intercept[IllegalArgumentException](AviCodec.decodeAvi24(avi))
    assert(ex.getMessage.contains("decodeAviVideo"))

    // genuinely lossy content (per-pixel gradient, 3 channels) stays
    // within quantization error and keeps exact dims/frame count
    val rgb = Array.tabulate(2)(f =>
      JpegCodec.encodeJpeg(w, h, 3, i => ((i * 3 + f * 40) % 256).toByte))
    val lv = AviCodec.decodeAviVideo(AviCodec.encodeAviMjpeg(w, h, 10, rgb))
    assert((lv.width, lv.height, lv.frames.length) == (w, h, 2))
    (0 until 2).foreach { f =>
      val err = lv.frames(f).zipWithIndex.map { case (b, i) =>
        math.abs((b & 0xff) - (((i * 3 + f * 40) % 256) & 0xff)) }.max
      assert(err <= 64, s"MJPEG frame $f error $err exceeds quantization class")
    }

    // a frame whose SOF dims disagree with strf is corrupt, not a resize
    val wrongDims = AviCodec.encodeAviMjpeg(w + 1, h, 10, frames)
    intercept[IllegalArgumentException](AviCodec.decodeAviVideo(wrongDims))
    // a corrupted entropy stream inside one frame fails loudly: the SOS
    // header is 10 bytes, so sos+10/11 are the first entropy bytes — an
    // unstuffed FF C0 there is an in-stream marker the reader must reject
    val corrupt = avi.clone()
    val sos = avi.indexOfSlice(Array[Byte](0xff.toByte, 0xda.toByte))
    corrupt(sos + 10) = 0xff.toByte; corrupt(sos + 11) = 0xc0.toByte
    intercept[IllegalArgumentException](AviCodec.decodeAviVideo(corrupt))
    // non-JPEG frame blobs are refused at encode time
    intercept[IllegalArgumentException](
      AviCodec.encodeAviMjpeg(w, h, 10, Array(Array[Byte](1, 2, 3))))
  }

  test("video transcode: GIF animation → AVI keeps every composited frame byte-exact") {
    import spark.implicits._
    val one = Seq((5L, 20L)).toDF("doc_id", "n_chars")
    val gif = Multimodal.withGifAnimMedia(one)
      .collect().head.getAs[Array[Byte]]("media")
    val anim = GifCodec.decodeGifFrames(gif)
    val avi = Multimodal.transcodeGifToAvi(Multimodal.withGifAnimMedia(one))
      .collect().head.getAs[Array[Byte]]("media")
    val v = AviCodec.decodeAvi24(avi)
    assert((v.width, v.height, v.frames.length) ==
      (anim.width, anim.height, anim.frames.length))
    anim.frames.indices.foreach { f =>
      assert(v.frames(f).toSeq == anim.frames(f).toSeq,
        s"transcoded frame $f diverged")
    }
  }

  test("video pipeline: sampled-frame stats come from the bytes and match the generator") {
    val out = Multimodal.sampleVideoFrames(Multimodal.withVideoMedia(docs), 3)
      .collect().map(v => v.doc_id -> v).toMap
    // doc 1: n_chars=11 → w=4+11%9=6, h=3+11%7=7; frames = 2+1%4 = 3
    val v1 = out(1L)
    assert((v1.width, v1.height, v1.n_frames) == (6L, 7L, 3L))
    val gen = (f: Int, i: Int) => (31L * 1 + 11L * f + 7L * i) % 256L
    val expected = (0 until 3).map { j =>
      val f = j * 3 / 3
      (0 until 6 * 7 * 3).map(i => gen(f, i) * (i % 97 + 1) * (j + 1)).sum
    }.sum
    assert(v1.sampled_checksum == expected)
    assert(v1.media_bytes == 224L + 3 * (8 + ((3 * 6 + 3) / 4) * 4 * 7))
  }

  test("audio pipeline: decode stats come from the bytes and match the generator") {
    val out = Multimodal.decodeAudioStats(Multimodal.withAudioMedia(docs))
      .collect().map(a => a.doc_id -> a).toMap
    // doc 1: n_chars=11 → n = 64 + 11%200 = 75, rate = 8000 + (11%3)*4000 = 16000
    val a1 = out(1L)
    assert((a1.n_samples, a1.sample_rate, a1.media_bytes) == (75L, 16000L, 44L + 150L))
    val gen = (0 until 75).map(i => ((31L * 1 + 7L * i) % 65536L) - 32768L)
    assert(a1.sample_sum == gen.sum)
    assert(a1.sample_checksum == gen.zipWithIndex.map { case (v, i) => v * (i % 97 + 1) }.sum)
    assert(a1.peak_abs == gen.map(math.abs).max)
  }

  test("resampleAudio: integer-exact rate conversion; same-rate clips pass through") {
    val media = Multimodal.withAudioMedia(docs)
    val out = Multimodal.decodeAudioStats(Multimodal.resampleAudio(media, 12000))
      .collect().map(a => a.doc_id -> a).toMap
    // doc 1: 75 samples @16000 → downsample: outN = 75*12000/16000 = 56,
    // src index j*16000/12000 = j*4/3
    val a1 = out(1L)
    assert((a1.sample_rate, a1.n_samples) == (12000L, 56L))
    val gen = (i: Int) => ((31L * 1 + 7L * i) % 65536L) - 32768L
    val resampled = (0 until 56).map(j => gen(j * 16000 / 12000))
    assert(a1.sample_sum == resampled.sum)
    assert(a1.sample_checksum ==
      resampled.zipWithIndex.map { case (v, i) => v * (i % 97 + 1) }.sum)
    // doc 2: n_chars=3 → rate 8000 + (3%3)*4000 = 8000 → 1.5× upsample of
    // n = 64+3 = 67 samples → 100
    assert((out(2L).sample_rate, out(2L).n_samples) == (12000L, 100L))
  }

  test("pixel pipeline: decode stats come from the bytes and match the generator") {
    val out = Multimodal.decodePixelStats(Multimodal.withPixelMedia(docs))
      .collect().map(p => p.doc_id -> p).toMap
    // doc 1 (doc_id%3=1 → ppm): w=4+11%13=15, h=3+11%11=3, 3 channels
    val p1 = out(1L)
    assert((p1.format, p1.width, p1.height, p1.channels) == ("ppm", 15L, 3L, 3L))
    val n1 = 15 * 3 * 3
    val gen1 = (0 until n1).map(i => (31L * 1 + 7L * i) % 256)
    assert(p1.pix_sum == gen1.sum)
    assert(p1.pix_checksum == gen1.zipWithIndex.map { case (v, i) => v * (i % 97 + 1) }.sum)
    assert(p1.media_bytes == 9 + 2 + 1 + n1) // "P6\n15 3\n255\n" + raster
    // doc 2 (doc_id%3=2 → pgm): single channel
    val p2 = out(2L)
    assert((p2.format, p2.channels) == ("pgm", 1L))
  }

  test("decodeFeatures tolerates a corrupt blob behind a raw-pixel magic") {
    // "BM" magic but truncated garbage: must fall back to the raw fold,
    // never abort the scan job
    val junk = "BMnot really a bitmap".getBytes("UTF-8")
    val media = Seq((1L, junk, junk.length.toLong, "bmp"))
      .toDF("doc_id", "media", "media_bytes", "format")
    val out = Multimodal.decodeFeatures(media).collect()
    assert(out.length == 1)
    assert(out.head.features.toSeq == Multimodal.FakeCodec.fold(junk).toSeq)
  }

  test("decodeFeatures routes raw-pixel containers through the REAL decoder") {
    val media = Multimodal.withPixelMedia(docs)
      .withColumn("media_bytes", length(col("media")).cast("long"))
      .withColumn("format", lit("bmp"))
    val feats = Multimodal.decodeFeatures(media)
      .collect().map(d => d.doc_id -> d.features).toMap
    val blob1 = media.filter(col("doc_id") === 1L).select("media")
      .collect().head.getAs[Array[Byte]](0)
    // features fold over the DECODED pixels, which differ from a fold over
    // the raw container bytes (header + netpbm ASCII prefix included)
    val real = Multimodal.FakeCodec.fold(ImageCodec.decode(blob1).pixels).toSeq
    assert(feats(1L).toSeq == real)
    assert(feats(1L).toSeq != Multimodal.FakeCodec.fold(blob1).toSeq)
  }

  test("ImageCodec resize: exact integer box fit and nearest-neighbor index map") {
    // fitBox: unchanged inside the box; binding axis pins; min 1
    assert(ImageCodec.fitBox(4, 3, 9, 7) == (4, 3))
    assert(ImageCodec.fitBox(16, 4, 8, 8) == (8, 2))   // width binds
    assert(ImageCodec.fitBox(4, 16, 8, 8) == (2, 8))   // height binds
    assert(ImageCodec.fitBox(100, 1, 8, 8) == (8, 1))  // floor clamps to 1
    // 2x2 → 1x1 nearest neighbor keeps the TOP-LEFT pixel (xs = 0·2/1)
    val px2 = Array[Byte](10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42)
    val img = ImageCodec.DecodedImage("ppm", 2, 2, 3, px2)
    assert(ImageCodec.resizeNearest(img, 1, 1).pixels.toSeq == Seq[Byte](10, 11, 12))
    // identity resize is a no-op; encode(decode) round-trips the container
    assert(ImageCodec.resizeNearest(img, 2, 2).pixels.toSeq == px2.toSeq)
    assert(ImageCodec.decode(ImageCodec.encode(img)).pixels.toSeq == px2.toSeq)
    // 4x2 → 2x1: src columns 0 and 2 of the top row
    val img4 = ImageCodec.DecodedImage("pgm", 4, 2, 1,
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    assert(ImageCodec.resizeNearest(img4, 2, 1).pixels.toSeq == Seq[Byte](1, 3))
  }

  test("resizeMedia: full decode→fit→resample→re-encode chain on real containers") {
    val media = Multimodal.withPixelMedia(docs)
    val out = Multimodal.decodePixelStats(Multimodal.resizeMedia(media, 9, 7))
      .collect().map(p => p.doc_id -> p).toMap
    // doc 1: ppm 15x3 → width binds at 9 → 9 x floor(3*9/15)=1
    val p1 = out(1L)
    assert((p1.format, p1.width, p1.height, p1.channels) == ("ppm", 9L, 1L, 3L))
    // replay the integer chain: out pixel (x,0,ch) ← src (x*15/9, 0*3/1, ch)
    val gen = (i: Int) => (31L * 1 + 7L * i) % 256
    val expected = for (x <- 0 until 9; ch <- 0 until 3)
      yield gen(((0 * 3 / 1) * 15 + (x * 15 / 9)) * 3 + ch)
    assert(p1.pix_sum == expected.sum)
    // doc 2: pgm, dims depend on n_chars=3 → w=4+3%13=7, h=3+3%11=6 →
    // inside the 9x7 box → unchanged
    val p2 = out(2L)
    assert((p2.format, p2.width, p2.height) == ("pgm", 7L, 6L))
  }

  test("transcodeMedia: JPEG→PNG normalization is pixel-exact; lossy/lossless rules hold") {
    // DC-only JPEG fixtures decode in closed form; PNG is lossless — the
    // chain must reproduce the generator bytes exactly for gray AND color
    val jpegs = Multimodal.withJpegMedia(docs)
    val out = Multimodal.decodePixelStats(Multimodal.transcodeMedia(jpegs, "png"))
      .collect().map(p => p.doc_id -> p).toMap
    val direct = Multimodal.decodePixelStats(jpegs)
      .collect().map(p => p.doc_id -> p).toMap
    direct.foreach { case (id, d) =>
      val p = out(id)
      assert(p.format == "png", s"doc $id format")
      assert((p.width, p.height, p.channels, p.pix_sum, p.pix_checksum) ==
        (d.width, d.height, d.channels, d.pix_sum, d.pix_checksum),
        s"doc $id transcode changed pixels")
    }
    // gray JPEG → ppm: channel replication to RGB (sum triples)
    val toPpm = Multimodal.decodePixelStats(
      Multimodal.transcodeMedia(jpegs.filter(col("doc_id") % 3 === 0), "ppm"))
      .collect().map(p => p.doc_id -> p).toMap
    toPpm.foreach { case (id, p) =>
      assert(p.channels == 3L && p.pix_sum == direct(id).pix_sum * 3, s"doc $id gray→ppm")
    }
    // RGB → pgm would silently drop color: refused, not coerced
    val ex = intercept[org.apache.spark.SparkException](
      Multimodal.transcodeMedia(jpegs.filter(col("doc_id") % 3 === 1), "pgm")
        .collect())
    assert(ex.getCause.getMessage.contains("silently dropped"),
      s"wrong refusal: ${ex.getCause.getMessage}")
  }

  test("resizeMedia: container without a pixel path is rejected loudly, " +
    "never truncated-byte payloads") {
    // The byte-truncation resize stub is retired: the ONE resize surface
    // is resizeMedia, and a WebP container (real VP8X header bytes from
    // withMedia, no decode path) must fail with the codec's unrecognized-
    // container error — corrupt "resized" bytes must be impossible.
    val webp = Multimodal.withMedia(docs)
      .filter(col("format") === "webp").select("doc_id", "media")
    assert(webp.count() > 0, "fixture should contain WebP rows")
    val ex = intercept[org.apache.spark.SparkException](
      Multimodal.resizeMedia(webp, maxW = 10, maxH = 10).collect())
    assert(ex.getCause.getMessage.contains("unrecognized container"),
      s"wrong refusal: ${ex.getCause.getMessage}")
  }

  test("phash64: deterministic, brightness-scale invariant, near beats far") {
    def img(w: Int, h: Int, f: Int => Int) =
      ImageCodec.DecodedImage("ppm", w, h, 3,
        Array.tabulate(w * h * 3)(i => f(i).toByte))
    val a = img(16, 12, i => (i / 3) % 256)
    assert(Multimodal.phash64(a) == Multimodal.phash64(img(16, 12, i => (i / 3) % 256)),
      "hash must be deterministic")
    // EXACT invariance under positive brightness scaling: all DCT
    // coefficients and the median scale together, so every bit holds.
    // Grayscale path (c=1) keeps luma linear in the pixel value.
    def gray(f: Int => Int) = ImageCodec.DecodedImage("pgm", 16, 12, 1,
      Array.tabulate(192)(i => f(i).toByte))
    val base = gray(i => (i * 7) % 80)
    val scaled = gray(i => ((i * 7) % 80) * 3)
    assert(Multimodal.phash64(base) == Multimodal.phash64(scaled),
      "pHash must be invariant under 3x brightness scaling")
    // perceptual ordering needs TEXTURED content (a pure gradient leaves
    // 60 of 63 AC coefficients hovering at the median — their bits are
    // noise by construction): low-amplitude noise over a textured base
    // stays close; structurally different texture lands near 32/64
    val tex = img(16, 12, i => (i * 37 + (i * i) % 251) % 256)
    val near = img(16, 12, i => ((i * 37 + (i * i) % 251) % 256 + i % 3) % 256)
    val far = img(16, 12, i => (i * 53 + (i * i) % 241) % 256)
    val (th, tl) = Multimodal.phash64(tex)
    val (nh, nl) = Multimodal.phash64(near)
    val (fh, fl) = Multimodal.phash64(far)
    val hamNear = java.lang.Long.bitCount(th ^ nh) + java.lang.Long.bitCount(tl ^ nl)
    val hamFar = java.lang.Long.bitCount(th ^ fh) + java.lang.Long.bitCount(tl ^ fl)
    assert(hamNear < 16, s"low-amplitude noise moved $hamNear of 64 bits")
    assert(hamFar > hamNear, s"different texture ($hamFar) not farther than noise ($hamNear)")
    // the halves stay inside 32 bits (the no-sign-bit contract)
    Seq((th, tl), (nh, nl), (fh, fl)).foreach { case (h, l) =>
      assert(h >= 0L && h < (1L << 32) && l >= 0L && l < (1L << 32))
    }
  }

  test("sampleFrames: n fixed-size windows per blob, in-row") {
    val rows = Multimodal.sampleFrames(Multimodal.withMedia(docs), n = 3, frameBytes = 4)
      .select("doc_id", "frames").orderBy("doc_id").collect()
    val frames = rows(0).getSeq[Array[Byte]](1)
    assert(frames.length == 3)
    // the first frame window starts at the blob's head — the RIFF fourcc
    assert(new String(frames.head, "ASCII") == "RIFF")
  }

  test("gainAudio: truncating division, both clip rails, rate/layout untouched") {
    import spark.implicits._
    val samples = Array[Short](30000, -30000, 5, -5, 0, 32767, -32768)
    val wav = WavCodec.encodePcm16(22050, samples.length, i => samples(i))
    val out = Multimodal.gainAudio(Seq((1L, wav)).toDF("doc_id", "media"), 5, 4)
      .collect().head.getAs[Array[Byte]]("media")
    val dec = WavCodec.decodePcm16(out)
    assert(dec.sampleRate == 22050 && dec.channels == 1)
    // 37500 clips to 32767; -37500 to -32768; 6.25 truncates to 6 (and
    // -6.25 to -6, NOT -7 — SQL integer division truncates toward zero)
    assert(dec.samples.toSeq == Seq[Short](32767, -32768, 6, -6, 0, 32767, -32768),
      s"got ${dec.samples.toSeq}")
  }

  test("flipMedia: mirrors columns channel-wise; involution; sum invariant") {
    import spark.implicits._
    // 3x2 RGB with per-pixel-distinct values: pixel (x,y) = (10x+y, 100+x, 200+y)
    val w = 3; val h = 2; val c = 3
    val px = new Array[Byte](w * h * c)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * c
      px(i) = (10 * x + y).toByte; px(i + 1) = (100 + x).toByte; px(i + 2) = (200 + y).toByte
    }
    val bytes = ImageCodec.encode(ImageCodec.DecodedImage("ppm", w, h, c, px))
    val df = Seq((1L, bytes)).toDF("doc_id", "media")
    val once = Multimodal.flipMedia(df)
    val img = ImageCodec.decode(once.collect().head.getAs[Array[Byte]]("media"))
    // (0,0) must now hold the original (2,0) = (20, 102, 200)
    assert((img.pixels(0) & 0xff, img.pixels(1) & 0xff, img.pixels(2) & 0xff) ==
      ((20, 102, 200)))
    // flip twice = identity
    val twice = ImageCodec.decode(
      Multimodal.flipMedia(once).collect().head.getAs[Array[Byte]]("media"))
    assert(twice.pixels.toSeq == px.toSeq)
    // the value multiset is permuted, never changed
    assert(img.pixels.map(_ & 0xff).sum == px.map(_ & 0xff).sum)
  }
}
