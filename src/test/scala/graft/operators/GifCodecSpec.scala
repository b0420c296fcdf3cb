package graft.operators

import graft.SparkTestBase
import GifCodec.GifFrame

class GifCodecSpec extends SparkTestBase {

  private def grayPal: Array[Byte] = {
    val p = new Array[Byte](768)
    var j = 0
    while (j < 256) { p(3 * j) = j.toByte; p(3 * j + 1) = j.toByte; p(3 * j + 2) = j.toByte; j += 1 }
    p
  }

  private def idxGen(seed: Long, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    var i = 0
    while (i < n) { a(i) = ((31L * seed + 7L * i) % 256L).toByte; i += 1 }
    a
  }

  private def expectRgb(idx: Array[Byte], pal: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](idx.length * 3)
    var i = 0
    while (i < idx.length) {
      val v = idx(i) & 0xff
      out(3 * i) = pal(3 * v); out(3 * i + 1) = pal(3 * v + 1); out(3 * i + 2) = pal(3 * v + 2)
      i += 1
    }
    out
  }

  private val colorPal = Multimodal.gifPalette

  test("gif round-trips byte-exactly: coding variants × dims × seeds") {
    for {
      (w, h) <- Seq((1, 1), (4, 3), (16, 13), (7, 5), (64, 48), (33, 2))
      seed <- Seq(0L, 17L, 255L)
      variant <- 0 to 3
    } {
      val idx = idxGen(seed, w * h)
      val bytes = variant match {
        case 0 => GifCodec.encodeGif(w, h, idx, colorPal, version89 = false)
        case 1 => GifCodec.encodeGif(w, h, idx, colorPal, withGce = true)
        case 2 => GifCodec.encodeGif(w, h, idx, colorPal, interlace = true)
        case _ => GifCodec.encodeGif(w, h, idx, colorPal, localPalette = true, clearEvery = 100)
      }
      val img = GifCodec.decodeGif(bytes)
      assert(img.format == "gif" && img.width == w && img.height == h && img.channels == 3)
      assert(java.util.Arrays.equals(img.pixels, expectRgb(idx, colorPal)),
        s"gif round-trip mismatch at ${w}x$h seed=$seed variant=$variant")
    }
  }

  test("gif LZW survives table growth past every width boundary and the 4096 reset") {
    // 300x300 = 90k pixels of slowly-varying content forces the code
    // width through 9..12 bits and multiple 4096-entry table resets
    val n = 300 * 300
    val idx = new Array[Byte](n)
    var i = 0
    while (i < n) { idx(i) = ((i / 3) % 251).toByte; i += 1 }
    val bytes = GifCodec.encodeGif(300, 300, idx, grayPal)
    val img = GifCodec.decodeGif(bytes)
    assert(img.width == 300 && img.height == 300)
    assert(java.util.Arrays.equals(img.pixels, expectRgb(idx, grayPal)))
    // and the mid-stream early-clear path at several cadences
    for (clearEvery <- Seq(3, 50, 1000)) {
      val b2 = GifCodec.encodeGif(120, 40, idxGen(9L, 4800), grayPal, clearEvery = clearEvery)
      assert(java.util.Arrays.equals(GifCodec.decodeGif(b2).pixels,
        expectRgb(idxGen(9L, 4800), grayPal)), s"clearEvery=$clearEvery")
    }
  }

  test("gif LZW actually compresses repetitive content") {
    val n = 64 * 64
    val idx = new Array[Byte](n) // constant 0
    val bytes = GifCodec.encodeGif(64, 64, idx, grayPal)
    assert(bytes.length < 13 + 768 + 10 + n / 8,
      s"constant 64x64 should LZW-compress far below $n, got ${bytes.length}")
  }

  test("gif interlace uses the spec 8/8/4/2 pass order") {
    // deinterlaceRow must be a bijection onto 0..h-1 hitting the spec order
    for (h <- Seq(1, 2, 3, 4, 5, 8, 13, 17)) {
      val rows = (0 until h).map(GifCodec.deinterlaceRow(_, h))
      assert(rows.sorted == (0 until h), s"h=$h rows=$rows")
    }
    assert((0 until 10).map(GifCodec.deinterlaceRow(_, 10)) ==
      Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9))
  }

  test("gif animation: full-frame sequence decodes with per-frame content and delays") {
    val (w, h) = (8, 5)
    val frames = (0 until 3).map { f =>
      GifFrame(0, 0, w, h, idxGen(100 + f, w * h), delayCs = 10 * (f + 1))
    }
    val bytes = GifCodec.encodeGifAnim(w, h, colorPal, frames, loop = true)
    val anim = GifCodec.decodeGifFrames(bytes)
    assert(anim.width == w && anim.height == h && anim.frames.length == 3)
    assert(anim.delaysCs.toSeq == Seq(10, 20, 30))
    for (f <- 0 until 3)
      assert(java.util.Arrays.equals(anim.frames(f), expectRgb(idxGen(100 + f, w * h), colorPal)),
        s"frame $f")
  }

  test("gif animation: sub-rect frames, transparency keying and all disposal methods") {
    // canvas 4x4, gray palette; frame 0 paints all 5s; frame 1 paints a
    // 2x2 rect at (1,1) with value 9 except a transparent pixel keyed on
    // index 7; disposal semantics checked frame by frame
    val pal = grayPal
    val f0 = GifFrame(0, 0, 4, 4, Array.fill[Byte](16)(5), disposal = 0)
    // rect indices: [9, 7, 9, 9] with 7 transparent → canvas keeps 5 there
    val f1 = GifFrame(1, 1, 2, 2, Array[Byte](9, 7, 9, 9),
      transparentIndex = 7, disposal = 3) // restore-to-previous after render
    val f2 = GifFrame(0, 0, 1, 1, Array[Byte](1), disposal = 2) // then restore bg
    val f3 = GifFrame(3, 3, 1, 1, Array[Byte](2))
    val bytes = GifCodec.encodeGifAnim(4, 4, pal, Seq(f0, f1, f2, f3))
    val anim = GifCodec.decodeGifFrames(bytes)
    assert(anim.frames.length == 4)
    def px(f: Int, x: Int, y: Int): Int = anim.frames(f)((y * 4 + x) * 3) & 0xff
    // frame 0: all 5
    assert((0 until 16).forall(i => (anim.frames(0)(i * 3) & 0xff) == 5))
    // frame 1: rect painted except the transparent pixel at (2,1)
    assert(px(1, 1, 1) == 9 && px(1, 2, 1) == 5 && px(1, 1, 2) == 9 && px(1, 2, 2) == 9)
    assert(px(1, 0, 0) == 5)
    // frame 2: disposal 3 restored frame 0's canvas, then (0,0) painted 1
    assert(px(2, 0, 0) == 1 && px(2, 1, 1) == 5 && px(2, 2, 2) == 5)
    // frame 3: disposal 2 restored (0,0) to background (index 0 → value 0)
    assert(px(3, 0, 0) == 0 && px(3, 3, 3) == 2 && px(3, 1, 1) == 5)
  }

  test("gif malformed streams fail loudly, never misdecode") {
    val good = GifCodec.encodeGif(4, 3, idxGen(1L, 12), colorPal)
    def bad(mutate: Array[Byte] => Array[Byte]): Unit =
      intercept[IllegalArgumentException](GifCodec.decodeGif(mutate(good.clone())))
    // bad signature
    bad { b => b(0) = 'X'.toByte; b }
    bad { b => b(4) = '6'.toByte; b }
    // truncation at every prefix length must throw, never return garbage
    for (n <- 0 until good.length - 1)
      intercept[IllegalArgumentException](
        GifCodec.decodeGif(java.util.Arrays.copyOf(good, n)))
    // out-of-palette pixel index: 2-color palette, index 2 in the stream
    val twoColor = GifCodec.encodeGif(2, 1, Array[Byte](0, 1), Array[Byte](
      0, 0, 0, 255.toByte, 255.toByte, 255.toByte))
    assert(GifCodec.decodeGif(twoColor).pixels.length == 6)
    intercept[IllegalArgumentException](GifCodec.decodeGifFrames(Array[Byte]()))
    // frame rect outside canvas
    intercept[IllegalArgumentException](
      GifCodec.encodeGifAnim(4, 4, grayPal, Seq(GifFrame(3, 3, 2, 2, Array[Byte](1, 1, 1, 1)))))
    // reserved disposal method
    intercept[IllegalArgumentException](
      GifCodec.encodeGifAnim(2, 2, grayPal, Seq(GifFrame(0, 0, 2, 2, Array[Byte](1, 1, 1, 1), disposal = 4))))
  }

  test("gif header fields: 87a vs 89a, global vs local palette on the wire") {
    val idx = idxGen(2L, 12)
    val v87 = GifCodec.encodeGif(4, 3, idx, colorPal, version89 = false)
    assert(new String(v87, 0, 6, "US-ASCII") == "GIF87a")
    val v89 = GifCodec.encodeGif(4, 3, idx, colorPal, withGce = true)
    assert(new String(v89, 0, 6, "US-ASCII") == "GIF89a")
    val local = GifCodec.encodeGif(4, 3, idx, colorPal, localPalette = true)
    assert((local(10) & 0x80) == 0, "local-palette file must clear the GCT flag")
    assert((v87(10) & 0x80) != 0, "global-palette file must set the GCT flag")
    // all three decode to identical pixels
    val ref = GifCodec.decodeGif(v87).pixels
    assert(java.util.Arrays.equals(GifCodec.decodeGif(v89).pixels, ref))
    assert(java.util.Arrays.equals(GifCodec.decodeGif(local).pixels, ref))
  }

  test("ImageCodec routes GIF: sniff, decode, encode, transcode chain") {
    val idx = idxGen(4L, 16 * 13)
    val bytes = GifCodec.encodeGif(16, 13, idx, colorPal)
    assert(ImageCodec.sniff(bytes).contains("gif"))
    val img = ImageCodec.decode(bytes)
    assert(img.format == "gif" && img.channels == 3)
    // re-encode via the exact-palette path round-trips (content has ≤256 colors)
    val re = ImageCodec.encode(img)
    assert(java.util.Arrays.equals(ImageCodec.decode(re).pixels, img.pixels))
    // gray → gif via identity palette
    val gray = ImageCodec.DecodedImage("gif", 6, 4, 1, idxGen(8L, 24))
    val gb = ImageCodec.encode(gray)
    val gimg = ImageCodec.decode(gb)
    assert(gimg.channels == 3)
    for (i <- 0 until 24; k <- 0 until 3)
      assert((gimg.pixels(3 * i + k) & 0xff) == (idxGen(8L, 24)(i) & 0xff))
    // >256 unique colors is a loud reject, not a silent quantize
    val many = new Array[Byte](3 * 300)
    var i = 0
    while (i < 300) { many(3 * i) = (i % 256).toByte; many(3 * i + 1) = (i / 256).toByte; i += 1 }
    intercept[IllegalArgumentException](
      ImageCodec.encode(ImageCodec.DecodedImage("gif", 300, 1, 3, many)))
    // alpha refused
    intercept[IllegalArgumentException](
      ImageCodec.encode(ImageCodec.DecodedImage("gif", 2, 2, 4, new Array[Byte](16))))
  }
}
