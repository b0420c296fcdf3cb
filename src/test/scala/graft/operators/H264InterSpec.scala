package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** H.264 P slices: the two-frame IDR + P chain replayed against an
  * independent closed-form oracle, the 8.4.1.3 MV predictor and 8.4.1.1
  * P_Skip rules pinned directly, and the malformed/restriction surface.
  */
class H264InterSpec extends AnyFunSuite {

  private def expected(d: Long, w: Int, h: Int): (Array[Int], Array[Int]) = {
    val mbW = w / 16; val mbH = h / 16
    def tL1(m: Int): Int = ((37 * d + 19 * m) % 208 + 24).toInt
    def cb1(m: Int): Int = ((91 * d + 29 * (m / mbW + m % mbW)) % 240 + 8).toInt
    def cr1(m: Int): Int = ((53 * d + 31 * (m / mbW + m % mbW)) % 240 + 8).toInt
    def tL2(m: Int): Int = ((41 * d + 17 * m) % 208 + 24).toInt
    def cb2(m: Int): Int = ((91 * d + 23 * m) % 240 + 8).toInt
    def cr2(m: Int): Int = ((53 * d + 27 * m) % 240 + 8).toInt
    def cls(m: Int): Int = ((m % mbW + d + m / mbW) % 4).toInt
    def dL(m: Int): Int =
      (if ((d + 3 * m) % 2 == 0) 1 else -1) * (1 + ((d + m) % 6)).toInt
    def shift(m: Int): (Int, Int) = {
      val r = m / mbW; val c = m % mbW
      if (r == mbH - 1) (if (c > 0) -8 else 0, -16)
      else {
        val sx = ((d + m) % 3).toInt match {
          case 1 => if (c > 0) -16 else 0
          case 2 => if (c < mbW - 1) 16 else 0
          case _ => 0
        }
        (sx, if (r > 0) -16 else 16)
      }
    }
    val fb = w * h * 3 / 2
    val f1 = new Array[Int](fb)
    val f2 = new Array[Int](fb)
    for (y <- 0 until h; x <- 0 until w) {
      val m = (y / 16) * mbW + x / 16
      f1(y * w + x) = tL1(m)
      f2(y * w + x) = cls(m) match {
        case 1 => tL1(m)
        case 0 => tL1(m) + 4 * dL(m)
        case 2 =>
          val (sx, sy) = shift(m)
          tL1(((y + sy) / 16) * mbW + (x + sx) / 16)
        case _ => tL2(m)
      }
    }
    val cw = w / 2
    for (y <- 0 until h / 2; x <- 0 until w / 2) {
      val m = (y / 8) * mbW + x / 8
      val base = w * h
      f1(base + y * cw + x) = cb1(m)
      f1(base + cw * (h / 2) + y * cw + x) = cr1(m)
      val (u2, v2) = cls(m) match {
        case 1 => (cb1(m), cr1(m))
        case 0 => (cb2(m), cr2(m))
        case 2 =>
          val (sx, sy) = shift(m)
          val sm = ((y + sy / 2) / 8) * mbW + (x + sx / 2) / 8
          (cb1(sm), cr1(sm))
        case _ => (cb2(m), cr2(m))
      }
      f2(base + y * cw + x) = u2
      f2(base + cw * (h / 2) + y * cw + x) = v2
    }
    (f1, f2)
  }

  test("two-frame IDR + P chain equals the closed-form replay") {
    for (d <- 0L until 16L; w <- Seq(32, 48)) {
      val h = 32
      val stream = H264Codec.encodeInter(Multimodal.h264InterPlan(d, w, h))
      val frames = H264Codec.decodeSequence(stream)
      assert(frames.length == 2)
      val (e1, e2) = expected(d, w, h)
      val cw = w / 2
      for ((fr, ex, fi) <- Seq((frames(0), e1, 1), (frames(1), e2, 2))) {
        for (i <- 0 until w * h)
          assert((fr.y(i) & 0xff) == ex(i), s"d=$d w=$w f$fi luma (${i % w},${i / w})")
        for (i <- 0 until cw * (h / 2)) {
          assert((fr.u(i) & 0xff) == ex(w * h + i), s"d=$d w=$w f$fi cb $i")
          assert((fr.v(i) & 0xff) == ex(w * h + cw * (h / 2) + i), s"d=$d w=$w f$fi cr $i")
        }
      }
    }
  }

  test("MV predictor: exactly-one-matching-ref, median, and edge rules") {
    // 3x3 MB frame; current MB = 4 (center)
    val g = new H264Codec.MotionGrid(3, 3)
    def setMb(m: Int, ref: Int, x: Int, y: Int): Unit =
      g.fill((m % 3) * 4, (m / 3) * 4, 4, 4, ref, x, y)
    // only B (mb 1) is inter -> mvp = mvB
    setMb(1, 0, 40, -8)
    assert(H264Codec.mvPredictPart(g, 4, 4, 4, 4, 0, H264Codec.noneWritten) == ((40, -8)))
    // A and C inter too -> median per component
    setMb(3, 0, 8, 16)
    setMb(2, 0, 24, 4)
    assert(H264Codec.mvPredictPart(g, 4, 4, 4, 4, 0, H264Codec.noneWritten) == ((24, 4)))
    // row 0, c > 0: B and C unavailable -> mvA
    setMb(0, 0, -16, 8)
    assert(H264Codec.mvPredictPart(g, 1, 4, 0, 4, 0, H264Codec.noneWritten) == ((-16, 8)))
    // C unavailable at the right edge -> D (above-left) substitutes
    val g2 = new H264Codec.MotionGrid(3, 3)
    g2.fill(4, 0, 4, 4, 0, 8, 8)   // mb 1: D for mb 5
    g2.fill(8, 0, 4, 4, 0, 32, 0)  // mb 2: B
    g2.fill(4, 4, 4, 4, 0, 16, 24) // mb 4: A
    assert(H264Codec.mvPredictPart(g2, 5, 8, 4, 4, 0, H264Codec.noneWritten) == ((16, 8)))
  }

  test("16x8/8x16 directional preferences and in-MB partition neighbors") {
    val g = new H264Codec.MotionGrid(3, 3)
    g.fill(0, 4, 4, 4, 0, 10, 2) // mb 3: A of the center MB
    g.fill(4, 0, 4, 4, 0, 30, 6) // mb 1: B
    g.fill(8, 0, 4, 4, 0, 50, 4) // mb 2: C
    // top 16x8 prefers B; left 8x16 prefers A; right 8x16 prefers C
    assert(H264Codec.mvPredictPart(g, 4, 4, 4, 4, 1, H264Codec.noneWritten) == ((30, 6)))
    assert(H264Codec.mvPredictPart(g, 4, 4, 4, 2, 3, H264Codec.noneWritten) == ((10, 2)))
    assert(H264Codec.mvPredictPart(g, 4, 6, 4, 2, 4, H264Codec.noneWritten) == ((50, 4)))
    // bottom 16x8 prefers A (cells of mb 3's lower rows)
    val wrote: (Int, Int) => Boolean = (_, y0) => y0 < 2
    g.fill(4, 4, 4, 2, 0, 70, 8) // the already-decoded top partition
    assert(H264Codec.mvPredictPart(g, 4, 4, 6, 4, 2, wrote) == ((10, 2)))
    // A intra -> falls through to the standard process: B = the written
    // top partition, C unavailable in-row -> D = mb 3's middle rows
    g.fill(0, 6, 4, 2, -1, 0, 0)
    assert(H264Codec.mvPredictPart(g, 4, 4, 6, 4, 2, wrote) == ((10, 2)))
  }

  test("P_Skip zero triggers: edges and zero-motion neighbors") {
    val g = new H264Codec.MotionGrid(3, 3)
    for (m <- 0 until 9) g.fill((m % 3) * 4, (m / 3) * 4, 4, 4, 0, 8, 8)
    // left/top edges -> zero
    assert(H264Codec.skipMvCell(g, 0, 0, 0) == ((0, 0)))
    assert(H264Codec.skipMvCell(g, 3, 0, 4) == ((0, 0)))
    assert(H264Codec.skipMvCell(g, 1, 4, 0) == ((0, 0)))
    // interior with all-nonzero inter neighbors -> the 16x16 predictor
    assert(H264Codec.skipMvCell(g, 4, 4, 4) == ((8, 8)))
    // a zero-mv ref-0 left neighbor forces zero
    g.fill(0, 4, 4, 4, 0, 0, 0)
    assert(H264Codec.skipMvCell(g, 4, 4, 4) == ((0, 0)))
  }

  test("sub-MB partitions: 16x8/8x16 chain equals the closed-form replay") {
    for (d <- 0L until 10L; w <- Seq(32, 64)) {
      val h = 64
      val frames = H264Codec.decodeSequence(
        H264Codec.encodeInter(Multimodal.h264PartPlan(d, w, h)))
      assert(frames.length == 2)
      val mbW = w / 16; val tCols = mbW / 2
      def tL1(t: Int) = ((37 * d + 23 * t) % 208 + 24).toInt
      def cl(hi: Int, v: Int) = math.max(0, math.min(hi - 1, v))
      for (yy <- 0 until h; x <- 0 until w) {
        val r = yy / 16; val c = x / 16; val m = r * mbW + c
        val tile = (r / 2) * tCols + c / 2
        val want = ((c + d + r) % 4).toInt match {
          case 0 =>
            val dL = (if ((d + 3 * m) % 2 == 0) 1 else -1) * (1 + ((d + m) % 6)).toInt
            tL1(tile) + 4 * dL
          case 1 => tL1(tile)
          case 2 =>
            val (sx, sy) = if (yy % 16 < 8) (0, -16) else (-16, 0)
            tL1((cl(h, yy + sy) / 32) * tCols + cl(w, x + sx) / 32)
          case _ =>
            val (sx, sy) = if (x % 16 < 8) (0, 16) else (16, 0)
            tL1((cl(h, yy + sy) / 32) * tCols + cl(w, x + sx) / 32)
        }
        assert((frames(1).y(yy * w + x) & 0xff) == want, s"d=$d w=$w f2 ($x,$yy)")
      }
      for (yy <- 0 until h / 2; x <- 0 until w / 2) {
        val r = yy / 8; val c = x / 8; val m = r * mbW + c
        val tile = (r / 2) * tCols + c / 2
        def cB1(t: Int) = ((91 * d + 13 * t) % 240 + 8).toInt
        val want = ((c + d + r) % 4).toInt match {
          case 0 => ((91 * d + 23 * m) % 240 + 8).toInt
          case 1 => cB1(tile)
          case 2 =>
            val (sx, sy) = if (yy % 8 < 4) (0, -8) else (-8, 0)
            cB1((cl(h / 2, yy + sy) / 16) * tCols + cl(w / 2, x + sx) / 16)
          case _ =>
            val (sx, sy) = if (x % 8 < 4) (0, 8) else (8, 0)
            cB1((cl(h / 2, yy + sy) / 16) * tCols + cl(w / 2, x + sx) / 16)
        }
        assert((frames(1).u(yy * (w / 2) + x) & 0xff) == want, s"d=$d w=$w f2 cb ($x,$yy)")
      }
    }
  }

  test("P_8x8 chain: per-quadrant motion equals the closed-form replay") {
    for (d <- 0L until 10L; w <- Seq(32, 64)) {
      val h = 64
      val frames = H264Codec.decodeSequence(
        H264Codec.encodeInter(Multimodal.h264P8Plan(d, w, h)))
      assert(frames.length == 2)
      val mbW = w / 16; val tCols = mbW / 2
      def tL1(t: Int) = ((37 * d + 23 * t) % 208 + 24).toInt
      def cl(hi: Int, v: Int) = math.max(0, math.min(hi - 1, v))
      for (yy <- 0 until h; x <- 0 until w) {
        val r = yy / 16; val c = x / 16; val m = r * mbW + c
        val tile = (r / 2) * tCols + c / 2
        val want = ((c + d + 2 * r) % 4).toInt match {
          case 0 =>
            val dL = (if ((d + 3 * m) % 2 == 0) 1 else -1) * (1 + ((d + m) % 6)).toInt
            tL1(tile) + 4 * dL
          case 1 => tL1(tile)
          case 2 =>
            val k = (if (yy % 16 < 8) 0 else 2) + (if (x % 16 < 8) 0 else 1)
            val (sx, sy) = Seq((0, -16), (16, 0), (-16, 0), (0, 16))(k)
            tL1((cl(h, yy + sy) / 32) * tCols + cl(w, x + sx) / 32)
          case _ =>
            val sy = if (r > 0) -16 else 16
            tL1((cl(h, yy + sy) / 32) * tCols + x / 32)
        }
        assert((frames(1).y(yy * w + x) & 0xff) == want, s"d=$d w=$w f2 ($x,$yy)")
      }
    }
  }

  test("B slices: two reference lists, bi-prediction average, closed-form replay") {
    for (d <- 0L until 12L) {
      val w = 32; val h = 64
      val frames = H264Codec.decodeSequence(
        H264Codec.encodeInter(Multimodal.h264BPlan(d, w, h)))
      assert(frames.length == 3)
      val mbW = w / 16; val tCols = mbW / 2
      def tile(m: Int) = ((m / mbW) / 2) * tCols + (m % mbW) / 2
      def tL1(t: Int) = ((37 * d + 23 * t) % 208 + 24).toInt
      def dl2(m: Int) = (if ((d + 3 * m) % 2 == 0) 1 else -1) * (1 + ((d + m) % 6)).toInt
      for (yy <- 0 until h; x <- 0 until w) {
        val r = yy / 16; val c = x / 16; val m = r * mbW + c
        val f1v = tL1(tile(m))
        val f2v = f1v + 4 * dl2(m)
        assert((frames(0).y(yy * w + x) & 0xff) == f1v, s"d=$d f1 ($x,$yy)")
        assert((frames(1).y(yy * w + x) & 0xff) == f2v, s"d=$d f2 ($x,$yy)")
        val want = ((c + d + r) % 4).toInt match {
          case 0 => f2v
          case 1 =>
            val sy = if (r > 0) -16 else 16
            tL1(((yy + sy) / 32) * tCols + x / 32)
          case 2 => (f1v + f2v + 1) >> 1
          case _ => ((43 * d + 19 * m) % 208 + 24).toInt
        }
        assert((frames(2).y(yy * w + x) & 0xff) == want, s"d=$d f3 ($x,$yy) cls ${(c + d + r) % 4}")
      }
      // the B frame is NON-reference: had it entered the sliding window,
      // a fourth P slice would reference it — assert the stream shape
      assert(H264Codec.splitNals(H264Codec.encodeInter(Multimodal.h264BPlan(d, w, h)))
        .map(n => (n._1, n._2)).drop(2) == Seq((3, 5), (2, 1), (0, 1)))
    }
  }

  test("CABAC P slices: all three inter fixtures decode identically through CABAC") {
    for (d <- 0L until 8L) {
      val pairs = Seq(
        ("inter", () => Multimodal.h264InterPlan(d, 32, 32)),
        ("subpel", () => Multimodal.h264SubpelPlan(d, 32, 64)),
        ("part", () => Multimodal.h264PartPlan(d, 32, 64)),
        ("p8x8", () => Multimodal.h264P8Plan(d, 32, 64)),
        ("bslice", () => Multimodal.h264BPlan(d, 32, 64)))
      for ((name, mk) <- pairs) {
        val cb = H264Codec.decodeSequence(H264Codec.encodeInter(mk(), cabac = true))
        val cv = H264Codec.decodeSequence(H264Codec.encodeInter(mk()))
        assert(cb.length == cv.length && cb.length >= 2)
        for (i <- cb.indices) {
          assert(cb(i).y.sameElements(cv(i).y), s"$name d=$d f$i luma")
          assert(cb(i).u.sameElements(cv(i).u), s"$name d=$d f$i cb")
          assert(cb(i).v.sameElements(cv(i).v), s"$name d=$d f$i cr")
        }
      }
    }
  }

  test("malformed streams fail loudly; multi-frame decode() refused") {
    val good = H264Codec.encodeInter(Multimodal.h264InterPlan(2L, 32, 32))
    intercept[IllegalArgumentException](
      H264Codec.decodeSequence(java.util.Arrays.copyOf(good, good.length - 4)))
    // single-frame decode() refuses multi-frame sequences
    intercept[IllegalArgumentException](H264Codec.decode(good))
  }

  test("quarter-pel interpolation: all 16 positions against an independent gradient replay") {
    // gradient reference: the six-tap/average/bilinear kernels produce
    // position-dependent values a second implementation must reproduce
    val w = 64; val h = 32
    val y = Array.tabulate(w * h)(i => (((i % w) * 7 + (i / w) * 13 + 5) % 256).toByte)
    val u = Array.tabulate(w / 2 * h / 2)(i => (((i % (w / 2)) * 3 + (i / (w / 2)) * 11) % 256).toByte)
    val v = Array.tabulate(w / 2 * h / 2)(i => (((i % (w / 2)) * 5 + (i / (w / 2)) * 9 + 1) % 256).toByte)
    val ref = H264Codec.H264Frame(w, h, y, u, v)
    def cl(lo: Int, hi: Int, x: Int) = math.max(lo, math.min(hi, x))
    def P(x: Int, yy: Int): Int = y(cl(0, h - 1, yy) * w + cl(0, w - 1, x)) & 0xff
    // independent replay: build the padded raw-sum grids then pick per
    // the spec's position table
    def braw(x: Int, yy: Int) = P(x - 2, yy) - 5 * P(x - 1, yy) + 20 * P(x, yy) +
      20 * P(x + 1, yy) - 5 * P(x + 2, yy) + P(x + 3, yy)
    def hraw(x: Int, yy: Int) = P(x, yy - 2) - 5 * P(x, yy - 1) + 20 * P(x, yy) +
      20 * P(x, yy + 1) - 5 * P(x, yy + 2) + P(x, yy + 3)
    def c255(a: Int) = math.max(0, math.min(255, a))
    def hb(x: Int, yy: Int) = c255((braw(x, yy) + 16) >> 5)
    def hh(x: Int, yy: Int) = c255((hraw(x, yy) + 16) >> 5)
    def jj(x: Int, yy: Int) = c255((braw(x, yy - 2) - 5 * braw(x, yy - 1) + 20 * braw(x, yy) +
      20 * braw(x, yy + 1) - 5 * braw(x, yy + 2) + braw(x, yy + 3) + 512) >> 10)
    def av(a: Int, b: Int) = (a + b + 1) >> 1
    for (fx <- 0 to 3; fy <- 0 to 3) {
      val (pY, pU, pV) = H264Codec.mcFetch(ref, 16, 8, 8 + fx, 4 + fy)
      for (i <- 0 until 256) {
        val x = 16 + 2 + i % 16; val yy = 8 + 1 + i / 16
        val want = (fx, fy) match {
          case (0, 0) => P(x, yy)
          case (2, 0) => hb(x, yy)
          case (0, 2) => hh(x, yy)
          case (1, 0) => av(P(x, yy), hb(x, yy))
          case (3, 0) => av(hb(x, yy), P(x + 1, yy))
          case (0, 1) => av(P(x, yy), hh(x, yy))
          case (0, 3) => av(hh(x, yy), P(x, yy + 1))
          case (2, 2) => jj(x, yy)
          case (1, 1) => av(hb(x, yy), hh(x, yy))
          case (3, 1) => av(hb(x, yy), hh(x + 1, yy))
          case (1, 3) => av(hh(x, yy), hb(x, yy + 1))
          case (3, 3) => av(hh(x + 1, yy), hb(x, yy + 1))
          case (2, 1) => av(hb(x, yy), jj(x, yy))
          case (2, 3) => av(jj(x, yy), hb(x, yy + 1))
          case (1, 2) => av(hh(x, yy), jj(x, yy))
          case (3, 2) => av(jj(x, yy), hh(x + 1, yy))
          case _ => fail("unreachable")
        }
        assert(pY(i) == want, s"frac ($fx,$fy) px $i")
      }
      // chroma bilinear
      def PC(pl: Array[Byte], x: Int, yy: Int): Int =
        pl(cl(0, h / 2 - 1, yy) * (w / 2) + cl(0, w / 2 - 1, x)) & 0xff
      val cdx = (8 + fx) & 7; val cdy = (4 + fy) & 7
      for (i <- 0 until 64) {
        val x = 8 + ((8 + fx) >> 3) + i % 8; val yy = 4 + ((4 + fy) >> 3) + i / 8
        val want = ((8 - cdx) * (8 - cdy) * PC(u, x, yy) + cdx * (8 - cdy) * PC(u, x + 1, yy) +
          (8 - cdx) * cdy * PC(u, x, yy + 1) + cdx * cdy * PC(u, x + 1, yy + 1) + 32) >> 6
        assert(pU(i) == want, s"chroma frac ($fx,$fy) px $i")
      }
    }
    // clamped out-of-frame reads: a far-left vector must replicate column 0
    val (pY2, _, _) = H264Codec.mcFetch(ref, 16, 8, -4000, 0)
    for (i <- 0 until 256)
      assert(pY2(i) == (y((8 + i / 16) * w) & 0xff), s"clamp px $i")
  }

  test("sub-pel chain: uniform tiles collapse under every fractional position") {
    for (d <- 0L until 10L; w <- Seq(32, 64)) {
      val h = 64
      val frames = H264Codec.decodeSequence(
        H264Codec.encodeInter(Multimodal.h264SubpelPlan(d, w, h)))
      assert(frames.length == 2)
      val mbW = w / 16; val tCols = mbW / 2
      def tile(r16: Int, c16: Int) = (r16 / 2) * tCols + c16 / 2
      def tL1(t: Int) = ((37 * d + 23 * t) % 208 + 24).toInt
      def cB1(t: Int) = ((91 * d + 13 * t) % 240 + 8).toInt
      def cR1(t: Int) = ((53 * d + 17 * t) % 240 + 8).toInt
      for (yy <- 0 until h; x <- 0 until w) {
        val r = yy / 16; val c = x / 16; val m = r * mbW + c
        val tl = tile(r, c)
        assert((frames(0).y(yy * w + x) & 0xff) == tL1(tl), s"d=$d w=$w f1 ($x,$yy)")
        val want = ((d + m) % 3).toInt match {
          case 0 =>
            val dL = (if ((d + 3 * m) % 2 == 0) 1 else -1) * (1 + ((d + m) % 6)).toInt
            tL1(tl) + 4 * dL
          case 1 => if (c >= 2) tL1((r / 2) * tCols) else tL1(c / 2)
          case _ => ((41 * d + 17 * m) % 208 + 24).toInt
        }
        assert((frames(1).y(yy * w + x) & 0xff) == want, s"d=$d w=$w f2 ($x,$yy)")
      }
      for (yy <- 0 until h / 2; x <- 0 until w / 2) {
        val r = yy / 8; val c = x / 8; val m = r * mbW + c
        val tl = tile(r, c)
        assert((frames(0).u(yy * (w / 2) + x) & 0xff) == cB1(tl))
        assert((frames(0).v(yy * (w / 2) + x) & 0xff) == cR1(tl))
        val (wu, wv) = ((d + m) % 3).toInt match {
          case 1 =>
            val st = if (c >= 2) (r / 2) * tCols else c / 2
            (cB1(st), cR1(st))
          case 0 | 2 =>
            (((91 * d + 23 * m) % 240 + 8).toInt, ((53 * d + 27 * m) % 240 + 8).toInt)
        }
        assert((frames(1).u(yy * (w / 2) + x) & 0xff) == wu, s"d=$d w=$w f2 cb ($x,$yy)")
        assert((frames(1).v(yy * (w / 2) + x) & 0xff) == wv, s"d=$d w=$w f2 cr ($x,$yy)")
      }
    }
  }

  test("sequence shape: SPS, PPS, IDR, then the non-IDR P slice") {
    val good = H264Codec.encodeInter(Multimodal.h264InterPlan(4L, 32, 32))
    assert(H264Codec.splitNals(good).map(_._2) == Seq(7, 8, 5, 1))
    assert(H264Codec.decodeSequence(good).length == 2)
  }
}
