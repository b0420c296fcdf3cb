package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Coded Intra_16x16 H.264: CAVLC residual round trips across all nC
  * contexts, prediction-formula pins, and the full encode→decode chain
  * replayed against an INDEPENDENT closed-form oracle (the same algebra
  * the DuckDB grade uses, written out separately from the codec).
  */
class H264IntraSpec extends AnyFunSuite {

  // ---- independent closed-form replay of the fixture plan ------------------

  private def clip(v: Int): Int = math.max(0, math.min(255, v))

  /** Expected planes for doc `d` at (w, h) — derived from the plan's
    * closed forms only (no codec internals).
    */
  private def expected(d: Long, w: Int, h: Int): (Array[Int], Array[Int], Array[Int]) = {
    val mbW = w / 16; val mbH = h / 16; val nMb = mbW * mbH
    def tL(m: Int): Int = ((37 * d + 19 * m) % 208 + 24).toInt
    def tCb(m: Int): Int = ((91 * d + 29 * (m / mbW + m % mbW)) % 240 + 8).toInt
    def tCr(m: Int): Int = ((53 * d + 31 * (m / mbW + m % mbW)) % 240 + 8).toInt
    def variant(m: Int): Int = ((d + m) % 5).toInt
    def modeSel(m: Int): Int = ((d + m) % 3).toInt
    def vh(m: Int): Int = ((d + m) % 2).toInt
    def sgn(m: Int): Int = if ((d + m) % 2 == 0) 1 else -1
    def steerCs(m: Int): Int =
      (if ((d + 3 * m) % 2 == 0) 1 else -1) * (1 + ((d + m) % 3)).toInt
    val hasPlane = mbW >= 2 && mbH >= 2
    def isPlane(m: Int): Boolean = hasPlane && m == nMb - 1
    // uniform luma value of a non-plane MB (recursion over the
    // pred-exact v1 and I4x4 v4 chains; strictly decreasing indices)
    def vOf(m: Int): Int = {
      val r = m / mbW; val c = m % mbW
      variant(m) match {
        case 1 =>
          if (r == 0 && c == 0) 128
          else if (r == 0) vOf(m - 1)
          else if (c == 0) vOf(m - mbW)
          else modeSel(m) match {
            case 0 => vOf(m - mbW)
            case 1 => vOf(m - 1)
            case _ => (vOf(m - mbW) + vOf(m - 1) + 1) >> 1
          }
        case 4 =>
          if (r == 0 && c == 0) 128
          else if (r == 0) vOf(m - 1)
          else if (c == 0) vOf(m - mbW)
          else if (vh(m) == 0) vOf(m - mbW)
          else vOf(m - 1)
        case _ => tL(m)
      }
    }
    def steered(m: Int): Boolean = {
      val r = m / mbW; val c = m % mbW
      variant(m) == 4 && !isPlane(m) && r == mbH - 1 && r > 0 &&
        (c == 0 || vh(m) == 0)
    }
    val luma = new Array[Int](w * h)
    val cb = new Array[Int]((w / 2) * (h / 2))
    val cr = new Array[Int]((w / 2) * (h / 2))
    for (y <- 0 until h; x <- 0 until w) {
      val r = y / 16; val c = x / 16; val m = r * mbW + c
      val xx = x % 16; val yy = y % 16
      val v =
        if (isPlane(m)) {
          val a = vOf(m - mbW); val l = vOf(m - 1); val al = vOf(m - mbW - 1)
          val b = (5 * (8 * (a - al)) + 32) >> 6
          val cc = (5 * (8 * (l - al)) + 32) >> 6
          clip((16 * (l + a) + b * (xx - 7) + cc * (yy - 7) + 16) >> 5)
        } else if (variant(m) == 2 && xx < 4 && yy < 4)
          tL(m) + sgn(m) * Array(14, 1, -9, -6)(xx)
        else if (steered(m) && xx < 4 && yy >= 12)
          vOf(m) + 4 * steerCs(m)
        else vOf(m)
      luma(y * w + x) = v
    }
    for (y <- 0 until h / 2; x <- 0 until w / 2) {
      val r = y / 8; val c = x / 8; val m = r * mbW + c
      val xx = x % 8; val yy = y % 8
      val rc = r + c
      def cbF(k: Int): Int = ((91 * d + 29 * k) % 240 + 8).toInt
      def crF(k: Int): Int = ((53 * d + 31 * k) % 240 + 8).toInt
      val (u0, v0) =
        if (isPlane(m)) {
          val nB = cbF(rc - 1); val calB = cbF(rc - 2)
          val bB = (17 * (4 * (nB - calB)) + 16) >> 5
          val nR = crF(rc - 1); val calR = crF(rc - 2)
          val bR = (17 * (4 * (nR - calR)) + 16) >> 5
          (clip((32 * nB + bB * (xx - 3) + bB * (yy - 3) + 16) >> 5),
            clip((32 * nR + bR * (xx - 3) + bR * (yy - 3) + 16) >> 5))
        } else if (variant(m) == 2 && xx < 4 && yy < 4)
          (tCb(m) + 2 * sgn(m) * Array(1, -1, -1, 1)(xx), tCr(m))
        else (tCb(m), tCr(m))
      cb(y * (w / 2) + x) = u0
      cr(y * (w / 2) + x) = v0
    }
    (luma, cb, cr)
  }

  test("coded Intra_16x16 chain: encode -> decode equals the closed-form replay") {
    for (d <- 0L until 12L; (w, h) <- Seq((16, 16), (32, 16), (48, 32), (32, 32))) {
      val stream = H264Codec.encodeIntra(Multimodal.h264IntraPlan(d, w, h))
      val f = H264Codec.decode(stream)
      assert(f.width == w && f.height == h)
      val (el, eu, ev) = expected(d, w, h)
      for (i <- 0 until w * h)
        assert((f.y(i) & 0xff) == el(i), s"d=$d ${w}x$h luma px $i (${i % w},${i / w})")
      for (i <- 0 until (w / 2) * (h / 2)) {
        assert((f.u(i) & 0xff) == eu(i), s"d=$d ${w}x$h cb px $i")
        assert((f.v(i) & 0xff) == ev(i), s"d=$d ${w}x$h cr px $i")
      }
    }
  }

  test("CABAC chain: the same steered frames decode identically through the CABAC backend") {
    for (d <- 0L until 12L; (w, h) <- Seq((16, 16), (32, 16), (48, 32), (32, 32))) {
      val stream = H264Codec.encodeIntra(Multimodal.h264IntraPlan(d, w, h), cabac = true)
      val f = H264Codec.decode(stream)
      assert(f.width == w && f.height == h)
      val (el, eu, ev) = expected(d, w, h)
      for (i <- 0 until w * h)
        assert((f.y(i) & 0xff) == el(i), s"cabac d=$d ${w}x$h luma px $i (${i % w},${i / w})")
      for (i <- 0 until (w / 2) * (h / 2)) {
        assert((f.u(i) & 0xff) == eu(i), s"cabac d=$d ${w}x$h cb px $i")
        assert((f.v(i) & 0xff) == ev(i), s"cabac d=$d ${w}x$h cr px $i")
      }
      // the entropy layers genuinely differ
      val cavlc = H264Codec.encodeIntra(Multimodal.h264IntraPlan(d, w, h))
      assert(!stream.sameElements(cavlc))
    }
  }

  test("CABAC engine: context and bypass bins round-trip under random sequences") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 50) {
      val n = 200 + rnd.nextInt(800)
      val kinds = Array.fill(n)(rnd.nextInt(3)) // 0 ctx bin, 1 bypass, 2 nothing-extra
      val ctxs = Array.fill(n)(rnd.nextInt(16))
      val bits = Array.fill(n)(rnd.nextInt(2))
      val bw = new java.io.ByteArrayOutputStream()
      var acc = 0; var nacc = 0
      def putBit(b: Int): Unit = {
        acc = (acc << 1) | b; nacc += 1
        if (nacc == 8) { bw.write(acc); acc = 0; nacc = 0 }
      }
      val stE = new Array[Int](2 * 16)
      val enc = new H264Cabac.Enc(putBit)
      for (i <- 0 until n) kinds(i) match {
        case 0 => enc.bin(stE, ctxs(i), bits(i))
        case 1 => enc.bypass(bits(i))
        case _ => ()
      }
      enc.terminate(1)
      while (nacc != 0) putBit(0)
      val buf = bw.toByteArray
      var pos = 0
      def nextBit(): Int =
        if (pos >= buf.length * 8) 0
        else { val b = (buf(pos / 8) >> (7 - pos % 8)) & 1; pos += 1; b }
      val stD = new Array[Int](2 * 16)
      val dec = new H264Cabac.Dec(() => nextBit())
      for (i <- 0 until n) kinds(i) match {
        case 0 => assert(dec.bin(stD, ctxs(i)) == bits(i), s"trial $trial ctx bin $i")
        case 1 => assert(dec.bypass() == bits(i), s"trial $trial bypass $i")
        case _ => ()
      }
      assert(dec.terminate() == 1, s"trial $trial terminate")
    }
  }

  test("CAVLC round trip: every nC context, escapes, T1 saturation, full blocks") {
    val rnd = new scala.util.Random(42)
    val contexts = Seq(-1, 0, 1, 2, 3, 4, 7, 8, 12, 16)
    for (nC <- contexts; trial <- 0 until 200) {
      val n = if (nC == -1) 4 else if (trial % 3 == 0) 16 else 15
      val coef = new Array[Int](n)
      val mode = trial % 5
      mode match {
        case 0 => // sparse small
          for (_ <- 0 until rnd.nextInt(4))
            coef(rnd.nextInt(n)) = rnd.nextInt(5) - 2
        case 1 => // trailing-one rich
          for (i <- n - math.min(n, 4) until n) coef(i) = if (rnd.nextBoolean()) 1 else -1
        case 2 => // big levels through the escape paths
          for (_ <- 0 until 1 + rnd.nextInt(3))
            coef(rnd.nextInt(n)) = (rnd.nextInt(4000) + 20) * (if (rnd.nextBoolean()) 1 else -1)
        case 3 => // full block (no total_zeros)
          for (i <- 0 until n) coef(i) = rnd.nextInt(9) - 4
          for (i <- 0 until n) if (coef(i) == 0) coef(i) = 1
        case _ => // dense mixed magnitudes (suffixLength adaptation)
          for (i <- 0 until n) if (rnd.nextBoolean())
            coef(i) = (1 << rnd.nextInt(10)) * (if (rnd.nextBoolean()) 1 else -1)
      }
      val back = H264Codec.cavlcRoundtrip(coef, nC)
      assert(back.sameElements(coef), s"nC=$nC trial=$trial: ${coef.mkString(",")} -> ${back.mkString(",")}")
    }
  }

  test("chroma DC prediction: per-quadrant source rules with distinct neighbors") {
    // an 16x16 chroma plane; MB at (8,8) has above row 8..15 = 10,11,..17
    // and left col 8..15 = 50,52,..64
    val cw = 16
    val rec = new Array[Byte](16 * 16)
    for (x <- 0 until 8) rec(7 * cw + 8 + x) = (10 + x).toByte
    for (y <- 0 until 8) rec((8 + y) * cw + 7) = (50 + 2 * y).toByte
    val p = H264Codec.predChroma8(0, rec, cw, 8, 8)
    // quadrant (0,0): (10+11+12+13 + 50+52+54+56 + 4) >> 3 = (46+212+4)>>3 = 32
    assert(p(0) == 32 && p(3 * 8 + 3) == 32)
    // quadrant (1,0): above only: (14+15+16+17+2)>>2 = 16
    assert(p(4) == 16 && p(3 * 8 + 7) == 16)
    // quadrant (0,1): left only: (58+60+62+64+2)>>2 = 61
    assert(p(4 * 8) == 61 && p(7 * 8 + 3) == 61)
    // quadrant (1,1): both: (62 + 244 + 4) >> 3 = 38
    assert(p(4 * 8 + 4) == 38 && p(7 * 8 + 7) == 38)
  }

  test("luma plane prediction: spec formula on a hand case") {
    // 32x32 luma; MB at (16,16): above row = 100..115 ramp, left col = 200..215,
    // corner p[-1,-1] = 90
    val w = 32
    val rec = new Array[Byte](32 * 32)
    rec(15 * w + 15) = 90.toByte
    for (i <- 0 until 16) rec(15 * w + 16 + i) = (100 + i).toByte
    for (i <- 0 until 16) rec((16 + i) * w + 15) = (200 + i).toByte
    val p = H264Codec.predIntra16(3, rec, w, 16, 16)
    // H = sum (x'+1)*(top[8+x'] - top[6-x']) for x'=0..7
    var hh = 0; var vv = 0
    val top = (0 until 16).map(100 + _)
    val lef = (0 until 16).map(200 + _)
    for (i <- 0 until 8) {
      hh += (i + 1) * (top(8 + i) - (if (6 - i >= 0) top(6 - i) else 90))
      vv += (i + 1) * (lef(8 + i) - (if (6 - i >= 0) lef(6 - i) else 90))
    }
    val a = 16 * (lef(15) + top(15))
    val b = (5 * hh + 32) >> 6
    val c = (5 * vv + 32) >> 6
    for (y <- 0 until 16; x <- 0 until 16)
      assert(p(y * 16 + x) == math.max(0, math.min(255, (a + b * (x - 7) + c * (y - 7) + 16) >> 5)),
        s"plane ($x,$y)")
  }

  test("I_4x4 directional prediction formulas: literal spec-derived pins") {
    // block at (4,8) of a 32-wide plane (above-right available there):
    // corner 5, above row 10..80 (incl. above-right), left col 90..120
    val w = 32
    val rec = new Array[Byte](32 * 32)
    rec(7 * w + 3) = 5
    for (i <- 0 until 8) rec(7 * w + 4 + i) = (10 * (i + 1)).toByte
    for (j <- 0 until 4) rec((8 + j) * w + 3) = (90 + 10 * j).toByte
    // independently derived from the 8.3.1.2 formulas (see python
    // derivation in the round notes); any drift in the diagonal bands,
    // the avg2/avg3 maps, or the zVR/zHD/zHU cases breaks these
    val want = Map(
      3 -> Array(20, 30, 40, 50, 30, 40, 50, 60, 40, 50, 60, 70, 50, 60, 70, 78),
      4 -> Array(28, 11, 20, 30, 71, 28, 11, 20, 100, 71, 28, 11, 110, 100, 71, 28),
      5 -> Array(8, 15, 25, 35, 28, 11, 20, 30, 71, 8, 15, 25, 100, 28, 11, 20),
      6 -> Array(48, 28, 11, 20, 95, 71, 48, 28, 105, 100, 95, 71, 115, 110, 105, 100),
      7 -> Array(15, 25, 35, 45, 20, 30, 40, 50, 25, 35, 45, 55, 30, 40, 50, 60),
      8 -> Array(95, 100, 105, 110, 105, 110, 115, 118, 115, 118, 120, 120, 120, 120, 120, 120))
    for ((mode, exp) <- want) {
      val got = H264Codec.predIntra4(mode, rec, w, 32, 4, 8)
      assert(got.sameElements(exp), s"mode $mode: ${got.mkString(",")}")
    }
    // V / H / DC sanity on the same support
    assert(H264Codec.predIntra4(0, rec, w, 32, 4, 8).take(4).sameElements(Array(10, 20, 30, 40)))
    assert(H264Codec.predIntra4(1, rec, w, 32, 4, 8).take(4).forall(_ == 90))
    assert(H264Codec.predIntra4(2, rec, w, 32, 4, 8)(0) == 65)
    // above-right replication: blkIdx 3 position (4,4) must replicate
    // p[3,-1] — make top(4..7) deliberately different and check DDL's
    // bottom-right cell uses the replicated value
    val rec2 = new Array[Byte](32 * 32)
    for (i <- 0 until 8) rec2(3 * w + 4 + i) = (if (i < 4) 40 else 200).toByte
    val ddl = H264Codec.predIntra4(3, rec2, w, 32, 4, 4)
    assert(ddl(15) == 40, "above-right must be replicated from p[3,-1] at blkIdx 3")
  }

  test("I_4x4 through a real stream: all nine modes against gradient PCM neighbors") {
    val w = 32; val h = 32
    val modes = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 3, 4, 5, 6, 7, 8, 2)
    val plan = H264Codec.IntraPlan(w, h,
      variant = mb => if (mb == 3) 4 else 3,
      modeSel = _ => 2,
      tL = mb => 60 + 10 * mb, tCb = _ => 90, tCr = _ => 120,
      acSign = _ => 1,
      planeLast = false,
      i4Modes = (mb, b) => { require(mb == 3); modes(b) },
      pcmY = (mb, xx, yy) => (60 + 10 * mb + 5 * xx + 3 * yy) % 256)
    val f = H264Codec.decode(H264Codec.encodeIntra(plan))
    // PCM gradients land exactly
    for (yy <- 0 until 16; xx <- 0 until 16)
      assert((f.y(yy * w + xx) & 0xff) == (60 + 5 * xx + 3 * yy) % 256)
    // replay MB3 block-by-block from the decoded PCM neighbors through
    // the shared prediction (zero residual -> recon IS the prediction);
    // the STREAM wiring (mode coding order, mpm chain, block order) is
    // what this pins — the formulas themselves are pinned literally above
    val exp = new Array[Byte](w * h)
    System.arraycopy(f.y, 0, exp, 0, w * h)
    def blkX(i: Int) = ((i >> 2) & 1) * 8 + (i & 1) * 4
    def blkY(i: Int) = ((i >> 3) & 1) * 8 + ((i >> 1) & 1) * 4
    for (b <- 0 until 16) {
      val bx = 16 + blkX(b); val by = 16 + blkY(b)
      val pr = H264Codec.predIntra4(modes(b), exp, w, h, bx, by)
      for (yy <- 0 until 4; xx <- 0 until 4)
        exp((by + yy) * w + bx + xx) = pr(yy * 4 + xx).toByte
    }
    for (yy <- 16 until 32; xx <- 16 until 32)
      assert((f.y(yy * w + xx) & 0xff) == (exp(yy * w + xx) & 0xff), s"($xx,$yy)")
    // chroma of the I4x4 MB: DC prediction off uniform PCM neighbors
    for (yy <- 8 until 16; xx <- 8 until 16) {
      assert((f.u(yy * 16 + xx) & 0xff) == 90)
      assert((f.v(yy * 16 + xx) & 0xff) == 120)
    }
  }

  test("malformed coded streams fail loudly") {
    val good = H264Codec.encodeIntra(Multimodal.h264IntraPlan(1L, 32, 32))
    // truncated mid-residual
    intercept[IllegalArgumentException](
      H264Codec.decode(java.util.Arrays.copyOf(good, good.length - 3)))
    // decode of a stream whose slice got bit-corrupted deep in CAVLC
    // either fails loudly or yields a frame that differs from the good
    // decode (never a silent identical pass)
    val bad = good.clone()
    bad(good.length - 6) = (bad(good.length - 6) ^ 0x40).toByte
    val ok = H264Codec.decode(good)
    try {
      val f = H264Codec.decode(bad)
      assert(!(f.y.sameElements(ok.y) && f.u.sameElements(ok.u) && f.v.sameElements(ok.v)),
        "corrupted stream decoded to an identical frame")
    } catch { case _: IllegalArgumentException => () }
  }

  test("ImageCodec routes coded streams; PCM-only fixture still byte-exact") {
    val b = H264Codec.encodeIntra(Multimodal.h264IntraPlan(4L, 32, 16))
    assert(ImageCodec.sniff(b).contains("h264"))
    val img = ImageCodec.decode(b)
    assert(img.format == "h264" && img.pixels.length == 32 * 16 * 3 / 2)
  }
}
