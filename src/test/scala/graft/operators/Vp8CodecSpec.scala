package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The lossy-WebP (VP8 intra) rung: the boolean arithmetic coder pair,
  * the exact integer inverse transforms, steered-exact reconstruction
  * across every fixture variant, container routing, and the
  * malformed-input surface.
  */
class Vp8CodecSpec extends AnyFunSuite {

  // ---- boolean coder -------------------------------------------------------

  test("bool coder: encoder and decoder are exact inverses on random streams") {
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { trial =>
      val n = 1 + rnd.nextInt(4000)
      val bits = Array.fill(n)(rnd.nextInt(2))
      val probs = Array.fill(n)(1 + rnd.nextInt(254))
      val enc = new Vp8Codec.BoolEncoder
      var i = 0
      while (i < n) { enc.put(bits(i), probs(i)); i += 1 }
      val bytes = enc.flush()
      val dec = new Vp8Codec.BoolDecoder(bytes, 0, bytes.length)
      i = 0
      while (i < n) {
        assert(dec.get(probs(i)) == bits(i), s"trial $trial bit $i")
        i += 1
      }
    }
  }

  test("bool coder: literals round-trip, including extreme values") {
    val enc = new Vp8Codec.BoolEncoder
    val vals = Seq((0, 1), (1, 1), (255, 8), (0, 8), (16383, 14), (77, 7))
    vals.foreach { case (v, n) => enc.putLiteral(v, n) }
    val bytes = enc.flush()
    val dec = new Vp8Codec.BoolDecoder(bytes, 0, bytes.length)
    vals.foreach { case (v, n) => assert(dec.literal(n) == v, s"literal $v/$n") }
  }

  test("bool coder: carry propagation survives a long all-one prefix") {
    // many high-probability ones push the range toward the carry path
    val enc = new Vp8Codec.BoolEncoder
    (0 until 2000).foreach(_ => enc.put(1, 254))
    enc.put(0, 2)
    val bytes = enc.flush()
    val dec = new Vp8Codec.BoolDecoder(bytes, 0, bytes.length)
    (0 until 2000).foreach(i => assert(dec.get(254) == 1, s"pos $i"))
    assert(dec.get(2) == 0)
  }

  // ---- transforms ----------------------------------------------------------

  test("inverse WHT: DC-only input spreads (V+3)>>3 to all 16 outputs") {
    for (v <- Seq(0, 1, 7, 8, 100, -1, -8, -100, 2047)) {
      val in = new Array[Int](16); in(0) = v
      val out = Vp8Codec.iwht4x4(in)
      assert(out.forall(_ == ((v + 3) >> 3)), s"V=$v → ${out.toSeq}")
    }
  }

  test("inverse DCT: DC-only input spreads (d+4)>>3 to all 16 outputs") {
    for (d <- Seq(0, 1, 4, 8, 255, -3, -8, -255)) {
      val in = new Array[Int](16); in(0) = d
      val out = Vp8Codec.idct4x4(in)
      assert(out.forall(_ == ((d + 4) >> 3)), s"d=$d → ${out.toSeq}")
    }
  }

  test("inverse DCT: AC input is not DC-flat (the 20091/35468 path is live)") {
    val in = new Array[Int](16); in(1) = 64
    val out = Vp8Codec.idct4x4(in)
    assert(out.distinct.length > 1, s"AC column collapsed: ${out.toSeq}")
    // linearity in the input: doubling the coefficient doubles (±rounding)
    val in2 = new Array[Int](16); in2(1) = 128
    val out2 = Vp8Codec.idct4x4(in2)
    assert(math.abs(out2(0) - 2 * out(0)) <= 1)
  }

  // ---- steered encode → exact decode ---------------------------------------

  private def yT(doc: Long)(mb: Int): Int = ((31 * doc + 13 * mb) % 256).toInt
  private def uT(doc: Long)(mb: Int): Int = ((91 * doc + 7 * mb) % 256).toInt
  private def vT(doc: Long)(mb: Int): Int = ((53 * doc + 11 * mb) % 256).toInt

  private def plans(doc: Long, w: Int, h: Int): Seq[Vp8Codec.Plan] = Seq(
    Vp8Codec.Plan(w, h, qi = 0, uvDcDelta = 0, yMode = 0,
      tokenPartitions = 1, skipAll = false, yT(doc), uT(doc), vT(doc)),
    Vp8Codec.Plan(w, h, qi = 8, uvDcDelta = -8, yMode = 0,
      tokenPartitions = 2, skipAll = false, yT(doc), uT(doc), vT(doc)),
    Vp8Codec.Plan(w, h, qi = 0, uvDcDelta = 0, yMode = 1,
      tokenPartitions = 1, skipAll = true, _ => 127, _ => 127, _ => 127),
    Vp8Codec.Plan(w, h, qi = 8, uvDcDelta = -8, yMode = 1,
      tokenPartitions = 1, skipAll = false, yT(doc), uT(doc), vT(doc)))

  test("every fixture variant decodes to the exact per-MB targets") {
    for {
      doc <- Seq(0L, 1L, 7L, 123L)
      (w, h) <- Seq((16, 16), (48, 32), (32, 16))
      (plan, vi) <- plans(doc, w, h).zipWithIndex
    } {
      val frame = Vp8Codec.decodeFrame(Vp8Codec.encodeFrame(plan))
      assert(frame.width == w && frame.height == h)
      val mbW = w / 16
      def expY(mb: Int) = if (plan.skipAll) 127 else plan.yTarget(mb)
      def expU(mb: Int) = if (plan.skipAll) 127 else plan.uTarget(mb)
      def expV(mb: Int) = if (plan.skipAll) 127 else plan.vTarget(mb)
      var i = 0
      while (i < w * h) {
        val mb = (i / w / 16) * mbW + (i % w) / 16
        assert((frame.y(i) & 0xff) == expY(mb),
          s"doc=$doc variant=$vi ${w}x$h Y[$i]: got ${frame.y(i) & 0xff}, want ${expY(mb)}")
        i += 1
      }
      i = 0
      while (i < (w / 2) * (h / 2)) {
        val mb = (i / (w / 2) / 8) * mbW + (i % (w / 2)) / 8
        assert((frame.u(i) & 0xff) == expU(mb), s"doc=$doc variant=$vi U[$i]")
        assert((frame.v(i) & 0xff) == expV(mb), s"doc=$doc variant=$vi V[$i]")
        i += 1
      }
    }
  }

  test("V_PRED skip variant: pure prediction cascade lands on the 127 edge row") {
    val p = plans(5L, 32, 32)(2)
    val f = Vp8Codec.decodeFrame(Vp8Codec.encodeFrame(p))
    assert(f.y.forall(b => (b & 0xff) == 127))
    assert(f.u.forall(b => (b & 0xff) == 127))
    assert(f.v.forall(b => (b & 0xff) == 127))
  }

  test("H_PRED: skip cascade lands on the 129 left edge; steered residue exact") {
    val skip = Vp8Codec.Plan(32, 32, qi = 0, uvDcDelta = 0, yMode = 2,
      tokenPartitions = 1, skipAll = true, _ => 129, _ => 129, _ => 129)
    val f = Vp8Codec.decodeFrame(Vp8Codec.encodeFrame(skip))
    assert(f.y.forall(b => (b & 0xff) == 129))
    assert(f.u.forall(b => (b & 0xff) == 129))
    assert(f.v.forall(b => (b & 0xff) == 129))
    val steered = Vp8Codec.Plan(48, 32, qi = 0, uvDcDelta = 0, yMode = 2,
      tokenPartitions = 1, skipAll = false, yT(9L), uT(9L), vT(9L))
    val g = Vp8Codec.decodeFrame(Vp8Codec.encodeFrame(steered))
    val mbW = 48 / 16
    var i = 0
    while (i < 48 * 32) {
      val mb = (i / 48 / 16) * mbW + (i % 48) / 16
      assert((g.y(i) & 0xff) == yT(9L)(mb), s"H_PRED Y[$i]")
      i += 1
    }
  }

  test("webp container: wrap + sniff + decode route") {
    val p = plans(3L, 16, 16).head
    val webp = Vp8Codec.wrapWebp(Vp8Codec.encodeFrame(p))
    assert(Vp8Codec.isVp8Webp(webp))
    assert(!WebpCodec.isVp8l(webp), "lossy VP8 must not sniff as VP8L")
    val img = ImageCodec.decode(webp)
    assert(img.format == "vp8")
    assert(img.width == 16 && img.height == 16 && img.channels == 3)
    assert(img.pixels.length == 16 * 16 * 3 / 2, "planar YUV 4:2:0 payload")
  }

  // ---- malformed inputs ----------------------------------------------------

  test("malformed: every corruption fails loudly, never garbage pixels") {
    val good = Vp8Codec.encodeFrame(plans(1L, 32, 16).head)
    def boom(bytes: Array[Byte], why: String): Unit = {
      val ex = intercept[IllegalArgumentException](Vp8Codec.decodeFrame(bytes))
      assert(ex.getMessage.startsWith("requirement failed"), s"$why: ${ex.getMessage}")
    }
    boom(good.take(5), "truncated before header end")
    val badStart = good.clone(); badStart(3) = 0x00
    boom(badStart, "broken 9D 01 2A start code")
    val interframe = good.clone(); interframe(0) = (interframe(0) | 1).toByte
    boom(interframe, "interframe flag set")
    val hugePart = good.clone()
    // first-partition size far past the buffer
    hugePart(1) = 0xff.toByte; hugePart(2) = 0xff.toByte
    boom(hugePart, "first partition overruns frame")
    val oddDims = good.clone(); oddDims(6) = 17 // 17 px wide: not a MB multiple
    boom(oddDims, "non-multiple-of-16 dims")
    // container-level checks
    val webp = Vp8Codec.wrapWebp(good)
    val badChunk = webp.clone(); badChunk(16) = 0xff.toByte; badChunk(17) = 0xff.toByte
    intercept[IllegalArgumentException](Vp8Codec.decodeWebp(badChunk))
    intercept[IllegalArgumentException](Vp8Codec.decodeWebp(webp.take(12)))
  }

  test("quantizer steering is exact for every delta at both fixture quantizers") {
    // the whole closed-form oracle rests on this: for y2dc=8 any delta m
    // has level v = 8m-4; coarser quantizers still land via the window
    for (m <- -255 to 255) {
      val d0 = (Vp8Codec.y2DcQ(0, 0) * (8 * m - 4) + 3) >> 3
      assert(((d0 + 4) >> 3) == m, s"qi=0 delta $m")
    }
  }
}
