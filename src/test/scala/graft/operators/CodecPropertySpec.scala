package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property tests for the container codecs: encode→decode must be the
  * identity on logical content for ARBITRARY dims and payloads — the
  * graded queries prove it for the fixture generator; these prove it for
  * the whole parameter space (odd widths exercising DIB padding, 1-pixel
  * edges, extreme sample values).
  *
  * Case budget: `GRAFT_PROP_CASES` (default 12) — same contract as the
  * other property suites (see README).
  */
class CodecPropertySpec extends SparkTestBase {

  private val nCases: Int = sys.env.getOrElse("GRAFT_PROP_CASES", "12").toInt

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val dims: Gen[(Int, Int)] =
    for { w <- Gen.chooseNum(1, 40); h <- Gen.chooseNum(1, 30) } yield (w, h)

  test("BMP/PPM/PGM: encode→decode is the identity for arbitrary dims and pixels") {
    (1L to nCases).foreach { seed =>
      val (w, h) = gen(dims, seed)
      val rgb = gen(Gen.listOfN(w * h * 3, Gen.chooseNum(0, 255)), seed + 1000)
        .map(_.toByte).toArray
      val gray = gen(Gen.listOfN(w * h, Gen.chooseNum(0, 255)), seed + 2000)
        .map(_.toByte).toArray
      Seq(
        ImageCodec.encodeBmp24(w, h, rgb(_)) -> rgb,
        ImageCodec.encodePpm(w, h, rgb(_)) -> rgb,
        ImageCodec.encodePgm(w, h, gray(_)) -> gray
      ).foreach { case (blob, expected) =>
        val img = ImageCodec.decode(blob)
        assert((img.width, img.height) == (w, h), s"seed=$seed dims mismatch")
        assert(img.pixels.toSeq == expected.toSeq, s"seed=$seed ${img.format} pixels differ")
        // re-encode is byte-identical (full container determinism)
        assert(ImageCodec.encode(img).toSeq == blob.toSeq, s"seed=$seed re-encode differs")
      }
    }
  }

  test("WAV PCM: encode→decode is the identity for arbitrary rates and samples") {
    (1L to nCases).foreach { seed =>
      val n = gen(Gen.chooseNum(0, 500), seed)
      val rate = gen(Gen.chooseNum(1, 192000), seed + 1)
      val samples = gen(Gen.listOfN(n,
        Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt)), seed + 2)
        .map(_.toShort).toArray
      val a = WavCodec.decodePcm16(WavCodec.encodePcm16(rate, n, samples(_)))
      assert(a.sampleRate == rate && a.channels == 1, s"seed=$seed header mismatch")
      assert(a.samples.toSeq == samples.toSeq, s"seed=$seed samples differ")
    }
  }

  test("AVI: encode→decode is frame-exact for arbitrary dims and frame counts") {
    (1L to math.max(1L, nCases / 2L)).foreach { seed =>
      val (w, h) = gen(dims, seed)
      val nf = gen(Gen.chooseNum(1, 6), seed + 1)
      val content = gen(Gen.listOfN(nf * w * h * 3, Gen.chooseNum(0, 255)), seed + 2)
        .map(_.toByte).toArray
      val v = AviCodec.decodeAvi24(
        AviCodec.encodeAvi24(w, h, nf, fps = 25, (f, i) => content(f * w * h * 3 + i)))
      assert((v.width, v.height, v.frames.length) == (w, h, nf), s"seed=$seed shape")
      (0 until nf).foreach { f =>
        assert(v.frames(f).toSeq ==
          content.slice(f * w * h * 3, (f + 1) * w * h * 3).toSeq,
          s"seed=$seed frame $f differs")
      }
    }
  }

  test("PNG: encode→decode is the identity for arbitrary dims, channels and filters") {
    (1L to nCases).foreach { seed =>
      val (w, h) = gen(dims, seed)
      val c = gen(Gen.oneOf(1, 2, 3, 4), seed + 4000)
      val px = gen(Gen.listOfN(w * h * c, Gen.chooseNum(0, 255)), seed + 5000)
        .map(_.toByte).toArray
      // fixed per-image filter AND rotating filter: both must round-trip
      Seq[Int => Int](_ => (seed % 5).toInt, r => (r + seed).toInt % 5).foreach { fo =>
        val blob = PngCodec.encodePng(w, h, c, px(_), fo)
        assert(ImageCodec.sniff(blob).contains("png"), s"seed=$seed sniff")
        val img = ImageCodec.decode(blob)
        assert((img.format, img.width, img.height, img.channels) == ("png", w, h, c),
          s"seed=$seed shape")
        assert(img.pixels.toSeq == px.toSeq, s"seed=$seed pixels differ")
        // ImageCodec.encode dispatch re-encodes decodable pngs
        assert(ImageCodec.decode(ImageCodec.encode(img)).pixels.toSeq == px.toSeq)
      }
    }
  }

  test("PNG: depth-16 encode→decode is the identity; true 16-bit content decodes to high bytes") {
    (1L to nCases).foreach { seed =>
      val (w, h) = gen(dims, seed)
      val c = gen(Gen.oneOf(1, 2, 3, 4), seed + 6000)
      val px = gen(Gen.listOfN(w * h * c, Gen.chooseNum(0, 255)), seed + 7000)
        .map(_.toByte).toArray
      val blob = PngCodec.encodePng(w, h, c, px(_), r => (r + seed).toInt % 5, bitDepth = 16)
      assert((blob(24) & 0xff) == 16, s"seed=$seed IHDR depth byte")
      val img = ImageCodec.decode(blob)
      assert((img.format, img.width, img.height, img.channels) == ("png", w, h, c),
        s"seed=$seed shape")
      assert(img.pixels.toSeq == px.toSeq, s"seed=$seed pixels differ at depth 16")
    }
    // a genuine 16-bit sample (not v·257): big-endian high byte comes back
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
      val tb = tag.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      val v = crc.getValue.toInt
      out.write(Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
      out.toByteArray
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val buf = new Array[Byte](256); val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val sig = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte)
    val ihdr16 = chunk("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 16, 0, 0, 0, 0))
    val one16 = sig ++ ihdr16 ++
      chunk("IDAT", deflate(Array[Byte](0, 0xab.toByte, 0xcd.toByte))) ++
      chunk("IEND", Array.emptyByteArray)
    val img16 = PngCodec.decodePng(one16)
    assert((img16.width, img16.height, img16.channels) == (1, 1, 1))
    assert((img16.pixels(0) & 0xff) == 0xab)
    // depth-16 palette is not defined by the spec — reject loudly
    val ihdr16p = chunk("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 16, 3, 0, 0, 0))
    val badP = intercept[IllegalArgumentException](PngCodec.decodePng(
      sig ++ ihdr16p ++ chunk("IDAT", deflate(Array[Byte](0, 0))) ++
        chunk("IEND", Array.emptyByteArray)))
    assert(badP.getMessage.contains("bit depth"))
  }

  test("PNG: chunk-walk strictness — unknown critical chunks, PLTE rules, encode raster bound") {
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
      val tb = tag.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      val v = crc.getValue.toInt
      out.write(Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
      out.toByteArray
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val buf = new Array[Byte](256); val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val sig = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte)
    val ihdrGray = chunk("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 0, 0, 0, 0))
    val idatGray = chunk("IDAT", deflate(Array[Byte](0, 42)))
    val iend = chunk("IEND", Array.emptyByteArray)
    def gray(extra: Array[Byte]*): Array[Byte] =
      sig ++ ihdrGray ++ extra.flatten ++ idatGray ++ iend
    // an unrecognized ANCILLARY chunk (lowercase first tag byte) is
    // skippable; the same payload under a CRITICAL tag must reject
    assert((PngCodec.decodePng(gray(chunk("teST", Array[Byte](1, 2, 3)))).pixels(0) & 0xff) == 42)
    val crit = intercept[IllegalArgumentException](
      PngCodec.decodePng(gray(chunk("TeST", Array[Byte](1, 2, 3)))))
    assert(crit.getMessage.contains("critical"))
    // PLTE in a grayscale image is a spec violation, not a skippable extra
    val grayPlte = intercept[IllegalArgumentException](
      PngCodec.decodePng(gray(chunk("PLTE", Array[Byte](1, 2, 3)))))
    assert(grayPlte.getMessage.contains("not permitted"))
    // palette image: duplicate PLTE and PLTE-after-IDAT both reject
    val ihdrPal = chunk("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 3, 0, 0, 0))
    val plte = chunk("PLTE", Array[Byte](9, 8, 7))
    val idatPal = chunk("IDAT", deflate(Array[Byte](0, 0)))
    val dup = intercept[IllegalArgumentException](
      PngCodec.decodePng(sig ++ ihdrPal ++ plte ++ plte ++ idatPal ++ iend))
    assert(dup.getMessage.contains("duplicate PLTE"))
    val late = intercept[IllegalArgumentException](
      PngCodec.decodePng(sig ++ ihdrPal ++ idatPal ++ plte ++ iend))
    assert(late.getMessage.contains("after first IDAT"))
    // well-formed palette image still decodes through this stricter walk
    val ok = PngCodec.decodePng(sig ++ ihdrPal ++ plte ++ idatPal ++ iend)
    assert(ok.pixels.toSeq == Seq[Byte](9, 8, 7))
    // encode-side raster bound: near-overflow dims fail the require, not
    // the allocator
    val big = intercept[IllegalArgumentException](
      PngCodec.encodePng(1 << 20, 1 << 20, 3, _ => 0.toByte))
    assert(big.getMessage.contains("exceeds"))
  }

  test("PNG: palette images decode through PLTE to exact RGB; bad indices and tRNS reject") {
    // hand-built palette PNG: 4 entries, 3x2 image, filter 0 rows
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
      val tb = tag.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      val v = crc.getValue.toInt
      out.write(Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
      out.toByteArray
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val buf = new Array[Byte](256); val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val sig = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte)
    val ihdr = chunk("IHDR", Array[Byte](0, 0, 0, 3, 0, 0, 0, 2, 8, 3, 0, 0, 0))
    val plte = chunk("PLTE", Array[Byte](
      10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
    def blob(indices: Array[Byte], extra: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
      val raw = Array[Byte](0, indices(0), indices(1), indices(2),
        0, indices(3), indices(4), indices(5))
      sig ++ ihdr ++ plte ++ extra ++ chunk("IDAT", deflate(raw)) ++
        chunk("IEND", Array.emptyByteArray)
    }
    val img = PngCodec.decodePng(blob(Array[Byte](0, 1, 2, 3, 2, 1)))
    assert((img.width, img.height, img.channels) == (3, 2, 3))
    assert(img.pixels.toSeq == Seq[Byte](
      10, 20, 30, 40, 50, 60, 70, 80, 90,
      100, 110, 120, 70, 80, 90, 40, 50, 60))
    // index 4 points past the 4-entry palette
    val bad = intercept[IllegalArgumentException](
      PngCodec.decodePng(blob(Array[Byte](0, 1, 2, 4, 2, 1))))
    assert(bad.getMessage.contains("palette index"))
    // tRNS alpha entries are outside the profile — reject, never mis-decode opaque
    val trns = intercept[IllegalArgumentException](
      PngCodec.decodePng(blob(Array[Byte](0, 1, 2, 3, 2, 1), chunk("tRNS", Array[Byte](0)))))
    assert(trns.getMessage.contains("tRNS"))
  }

  test("PNG: malformed blobs fail with IAE — truncation, CRC flip, bad filter, size lies") {
    val good = PngCodec.encodePng(5, 4, 3, i => (i * 7).toByte)
    // truncations at every prefix length fail loudly and only with IAE
    (8 until good.length by 7).foreach { n =>
      intercept[IllegalArgumentException](PngCodec.decodePng(good.take(n)))
    }
    // flip one payload byte inside IDAT → CRC catches it
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x55).toByte
    assert(intercept[IllegalArgumentException](PngCodec.decodePng(corrupt))
      .getMessage.contains("CRC"))
    // the synthetic header-only fixture (IHDR + text payload, zero CRC)
    // must reject — that is what routes it to the FakeCodec fallback
    val fixture = good.take(33) ++ "some text payload".getBytes("UTF-8")
    intercept[IllegalArgumentException](PngCodec.decodePng(fixture))
    // filter byte 5 is out of spec: rebuild IDAT with a bad filter
    intercept[IllegalArgumentException](
      PngCodec.encodePng(3, 3, 1, _ => 0.toByte, _ => 5))
  }

  test("PNG: arbitrary garbage after a valid signature only ever raises IAE") {
    // the tolerant-caller contract (decodeFeatures fallback): any byte
    // soup must surface as IllegalArgumentException, never a raw bounds /
    // zip / negative-size error. Also fuzz VALID encodes with one byte
    // mutated anywhere — the CRC/bounds layer must contain every case.
    val rnd = new scala.util.Random(42)
    val sig = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte)
    (1 to 200).foreach { i =>
      val body = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(body)
      try { PngCodec.decodePng(sig ++ body); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"case $i: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    val good = PngCodec.encodePng(6, 5, 3, i => (i * 13).toByte)
    (1 to 300).foreach { i =>
      val mutated = good.clone()
      val pos = rnd.nextInt(mutated.length)
      mutated(pos) = (mutated(pos) ^ (1 + rnd.nextInt(255))).toByte
      try { PngCodec.decodePng(mutated); () } // a sig-byte flip may just decode-fail
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"mutation at $pos: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("AVI: 100k-deep nested LISTs fail with IAE, not StackOverflowError") {
    // attacker-controlled nesting depth must never become recursion depth:
    // the walk is iterative, so a pathological blob terminates normally and
    // then fails the documented "no 'strf'" require
    val depth = 100000
    var inner = Array[Byte]('j', 'u', 'n', 'k') // innermost LIST type fourcc only
    (1 to depth).foreach { _ =>
      val out = new java.io.ByteArrayOutputStream(inner.length + 12)
      out.write(Array[Byte]('L', 'I', 'S', 'T'))
      val size = inner.length + 4
      out.write(Array[Byte](size.toByte, (size >> 8).toByte, (size >> 16).toByte, (size >> 24).toByte))
      out.write(Array[Byte]('r', 'e', 'c', ' '))
      out.write(inner)
      inner = out.toByteArray
    }
    val body = new java.io.ByteArrayOutputStream(inner.length + 12)
    body.write(Array[Byte]('R', 'I', 'F', 'F'))
    val rsz = inner.length + 4
    body.write(Array[Byte](rsz.toByte, (rsz >> 8).toByte, (rsz >> 16).toByte, (rsz >> 24).toByte))
    body.write(Array[Byte]('A', 'V', 'I', ' '))
    body.write(inner)
    val ex = intercept[IllegalArgumentException](AviCodec.decodeAvi24(body.toByteArray))
    assert(ex.getMessage.contains("strf"))
  }

  test("resizeNearest: output dims exact; every output pixel exists in the source frame") {
    (1L to nCases).foreach { seed =>
      val (w, h) = gen(dims, seed)
      val rgb = gen(Gen.listOfN(w * h * 3, Gen.chooseNum(0, 255)), seed + 3000)
        .map(_.toByte).toArray
      val img = ImageCodec.DecodedImage("ppm", w, h, 3, rgb)
      val (ow, oh) = ImageCodec.fitBox(w, h, 9, 7)
      assert(ow <= 9 && oh <= 7 && ow >= 1 && oh >= 1, s"seed=$seed box violated")
      // no upscale: an in-box image passes through unchanged
      if (w <= 9 && h <= 7) assert((ow, oh) == (w, h))
      val out = ImageCodec.resizeNearest(img, ow, oh)
      assert(out.pixels.length == ow * oh * 3)
      // each output pixel is the exact source pixel the index map names
      var y = 0
      while (y < oh) {
        var x = 0
        while (x < ow) {
          val (xs, ys) = (x * w / ow, y * h / oh)
          (0 until 3).foreach { c =>
            assert(out.pixels((y * ow + x) * 3 + c) == rgb((ys * w + xs) * 3 + c),
              s"seed=$seed pixel ($x,$y,$c)")
          }
          x += 1
        }
        y += 1
      }
    }
  }
}
