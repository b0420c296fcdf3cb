package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** H.264 §8.7 in-loop deblocking, graded three independent ways:
  *
  *  1. the fixture variants ([[Multimodal.h264DeblockIntraPlan]] /
  *     `h264DeblockInterPlan`) against HAND-DERIVED closed-form sample
  *     values (the boundary deltas are doc-independent, so every
  *     filtered offset below was computed on paper from the spec
  *     equations, not by running the codec);
  *  2. a from-scratch replay of the whole §8.7 process (own edge walk,
  *     own equations, (x,y)-indexed) against [[H264Deblock.filterFrame]]
  *     on a synthetic frame with non-uniform intra MBs — the
  *     bS=3-with-effect case the striped fixtures can't host — mixed
  *     per-MB QPs, clip saturation, and every strength class;
  *  3. encoder/decoder bit-exactness through both entropy backends.
  */
class H264DeblockSpec extends AnyFunSuite {

  // ---- helpers ---------------------------------------------------------------

  /** Decode and return (w, h, Y, U, V as Int arrays) of frame `fi`. */
  private def frame(bytes: Array[Byte], fi: Int): (Int, Int, Array[Int], Array[Int], Array[Int]) = {
    val fr = H264Codec.decodeSequence(bytes)(fi)
    (fr.width, fr.height, fr.y.map(_ & 0xff), fr.u.map(_ & 0xff), fr.v.map(_ & 0xff))
  }

  /** Compare a plane against a per-stripe-coordinate expectation. */
  private def checkPlane(name: String, got: Array[Int], w: Int, h: Int,
                         colv: Boolean, line: Int => Int): Unit = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val want = line(if (colv) x else y)
        assert(got(y * w + x) == want,
          s"$name($x,$y) colv=$colv: got ${got(y * w + x)}, want $want")
        x += 1
      }
      y += 1
    }
  }

  // ---- 1a. intra variant closed form ----------------------------------------

  test("intra variant: bS4 strong/weak, alpha cutoff, PCM QP-0 rule — closed form") {
    for (d <- Seq(0L, 4L, 13L, 49L); colv <- Seq(true, false)) {
      val b0 = (40 + (31 * d) % 120).toInt
      val c0 = (30 + (17 * d) % 150).toInt
      val d0 = (30 + (23 * d) % 150).toInt
      val lums = Array(b0, b0 + 5, b0 + 17, b0 + 57, b0 + 60)
      val cbs = Array(c0, c0 + 3, c0 + 15, c0 + 20, c0 + 22)
      val crs = Array(d0 + 8, d0, d0 + 7, d0 + 30, d0 + 31)
      val bytes = H264Codec.encodeIntra(
        Multimodal.h264DeblockIntraPlan(d, colv), deblock = true)
      val (w, h, gy, gu, gv) = frame(bytes, 0)
      assert((if (colv) w else h) == 80 && (if (colv) h else w) == 16)
      // luma: boundary 0|1 Δ=5 strong (p2..q2 move), boundary 1|2 Δ=12
      // bS4-weak (p0/q0 only), 2|3 Δ=40 ≥ α=20 untouched, 3|4 PCM frozen
      def lumLine(s: Int): Int = s match {
        case 13 => lums(0) + 1
        case 14 => lums(0) + 1
        case 15 => lums(0) + 2
        case 16 => lums(1) - 2
        case 17 => lums(1) - 1
        case 18 => lums(1) - 1
        case 31 => lums(1) + 3
        case 32 => lums(2) - 3
        case _ =>
          val m = s / 16
          if (m == 4) lums(4) + 6 * ((s % 16 / 4) % 2) else lums(m)
      }
      // chroma boundaries sit at s = 8m±; Cb filters on 0|1 (Δ3) and 2|3
      // (Δ5), NOT on 1|2 (Δ12 ≥ α_c=9); Cr filters on 0|1 (Δ−8) and 1|2
      // (Δ7) — per-plane conditions, deliberately different boundaries
      def cbLine(s: Int): Int = s match {
        case 7 => cbs(0) + 1
        case 8 => cbs(1) - 1
        case 23 => cbs(2) + 1
        case 24 => cbs(3) - 1
        case _ => cbs(s / 8)
      }
      def crLine(s: Int): Int = s match {
        case 7 => crs(0) - 2
        case 8 => crs(1) + 2
        case 15 => crs(1) + 2
        case 16 => crs(2) - 2
        case _ => crs(s / 8)
      }
      checkPlane(s"d=$d Y", gy, w, h, colv, lumLine)
      checkPlane(s"d=$d U", gu, w / 2, h / 2, colv, cbLine)
      checkPlane(s"d=$d V", gv, w / 2, h / 2, colv, crLine)
    }
  }

  // ---- 1b. inter variant closed form ----------------------------------------

  test("inter variant: bS 0/1/2, tC clip binding, raw reference — closed form") {
    for (d <- Seq(2L, 6L, 15L, 50L); colv <- Seq(true, false)) {
      val c = (40 + (29 * d) % 120).toInt
      val e = (30 + (13 * d) % 150).toInt
      val f = (30 + (19 * d) % 150).toInt
      val rl = Array(c, c + 5, c + 7, c + 90, c + 13)
      val rcb = Array(e, e + 4, e + 6, e + 40, e + 10)
      val rcr = Array(f + 9, f, f + 5, f + 40, f + 12)
      val bytes = H264Codec.encodeInter(
        Multimodal.h264DeblockInterPlan(d, colv), deblockP = true)
      // frame 1: idc=1, so the reference is the raw steered constants
      val (w, h, y1, u1, v1) = frame(bytes, 0)
      checkPlane(s"d=$d ref Y", y1, w, h, colv, s => rl(s / 16))
      checkPlane(s"d=$d ref U", u1, w / 2, h / 2, colv, s => rcb(s / 8))
      checkPlane(s"d=$d ref V", v1, w / 2, h / 2, colv, s => rcr(s / 8))
      // frame 2: skips copy MB0/MB1 (their 0|1 step is bS=0 — preserved),
      // MB2 codes +8 luma (bS=2 both sides), MB3 re-fetches the MB2
      // region via a −64 qpel mv (bS=1 vs MB4), MB4 zero-mv coded
      val (_, _, y2, u2, v2) = frame(bytes, 1)
      def lumLine(s: Int): Int = s match {
        case 30 => rl(1) + 2
        case 31 => rl(1) + 4
        case 32 => rl(2) + 8 - 4
        case 33 => rl(2) + 8 - 3
        // CASCADE (spec order, derived by hand): MB2's internal bS=2
        // edge at s=36 reads the b2-filtered q1 (s=33, −3) as its p2;
        // ap<β fires the p1 refinement with delta (−3)>>1 = −2
        case 34 => rl(2) + 8 - 2
        case 46 => rl(2) + 8 - 2
        case 47 => rl(2) + 8 - 3
        case 48 => rl(2) + 3
        case 49 => rl(2) + 2
        case 62 => rl(2) + 1
        case 63 => rl(2) + 2
        case 64 => rl(4) - 2 // bS=1: raw q1 delta −2 clips to −1 at s=65
        case 65 => rl(4) - 1
        case _ => Array(rl(0), rl(1), rl(2) + 8, rl(2), rl(4))(s / 16)
      }
      def cbLine(s: Int): Int = s match {
        case 15 => e + 6
        case 16 => e + 6
        case 23 => e + 7
        case 24 => e + 7
        case 31 => e + 8
        case 32 => e + 8
        case _ => Array(e, e + 4, e + 8, e + 6, e + 10)(s / 8)
      }
      def crLine(s: Int): Int = s match {
        case 15 => f + 1
        case 16 => f + 2
        case 23 => f + 4
        case 24 => f + 4
        case 31 => f + 7 // raw chroma delta 3 clips to tC=2
        case 32 => f + 10
        case _ => Array(f + 9, f, f + 3, f + 5, f + 12)(s / 8)
      }
      checkPlane(s"d=$d P Y", y2, w, h, colv, lumLine)
      checkPlane(s"d=$d P U", u2, w / 2, h / 2, colv, cbLine)
      checkPlane(s"d=$d P V", v2, w / 2, h / 2, colv, crLine)
    }
  }

  // ---- 2. from-scratch replay on a synthetic frame ---------------------------

  /** Independent §8.7 replay: (x,y)-indexed, own edge walk and
    * equations. Strength, thresholds and filters are re-stated from the
    * spec text; only the pinned constant tables are shared.
    */
  private def replay(yP: Array[Int], uP: Array[Int], vP: Array[Int],
                     w: Int, h: Int,
                     intraMb: Int => Boolean, pcmMb: Int => Boolean,
                     qpOf: Int => Int, nzCell: (Int, Int) => Boolean,
                     mvOf: (Int, Int) => (Int, Int), chromaQpOff: Int): Unit = {
    val mbW = w / 16
    def qpLuma(mb: Int) = if (pcmMb(mb)) 0 else qpOf(mb)
    def qpChroma(mb: Int) =
      H264Codec.chromaQp(math.max(0, math.min(51, qpLuma(mb) + chromaQpOff)))
    def bSOf(cxP: Int, cyP: Int, cxQ: Int, cyQ: Int, mbEdge: Boolean): Int = {
      val mbP = (cyP / 4) * mbW + cxP / 4
      val mbQ = (cyQ / 4) * mbW + cxQ / 4
      if (intraMb(mbP) || intraMb(mbQ)) (if (mbEdge) 4 else 3)
      else if (nzCell(cxP, cyP) || nzCell(cxQ, cyQ)) 2
      else {
        val (ax, ay) = mvOf(cxP, cyP)
        val (bx, by) = mvOf(cxQ, cyQ)
        if (math.abs(ax - bx) >= 4 || math.abs(ay - by) >= 4) 1 else 0
      }
    }
    // one line across an edge: ps/qs are p0..p3 / q0..q3; returns the
    // filtered (p2,p1,p0,q0,q1,q2)
    def lumaEdge(ps: Array[Int], qs: Array[Int], bS: Int, a: Int, b: Int,
                 t0: Int): (Int, Int, Int, Int, Int, Int) = {
      val fire = math.abs(ps(0) - qs(0)) < a && math.abs(ps(1) - ps(0)) < b &&
        math.abs(qs(1) - qs(0)) < b
      if (!fire) (ps(2), ps(1), ps(0), qs(0), qs(1), qs(2))
      else if (bS == 4) {
        val small = math.abs(ps(0) - qs(0)) < (a >> 2) + 2
        val (np0, np1, np2) =
          if (small && math.abs(ps(2) - ps(0)) < b)
            ((ps(2) + 2 * ps(1) + 2 * ps(0) + 2 * qs(0) + qs(1) + 4) / 8,
              (ps(2) + ps(1) + ps(0) + qs(0) + 2) / 4,
              (2 * ps(3) + 3 * ps(2) + ps(1) + ps(0) + qs(0) + 4) / 8)
          else ((2 * ps(1) + ps(0) + qs(1) + 2) / 4, ps(1), ps(2))
        val (nq0, nq1, nq2) =
          if (small && math.abs(qs(2) - qs(0)) < b)
            ((qs(2) + 2 * qs(1) + 2 * qs(0) + 2 * ps(0) + ps(1) + 4) / 8,
              (qs(2) + qs(1) + qs(0) + ps(0) + 2) / 4,
              (2 * qs(3) + 3 * qs(2) + qs(1) + qs(0) + ps(0) + 4) / 8)
          else ((2 * qs(1) + qs(0) + ps(1) + 2) / 4, qs(1), qs(2))
        (np2, np1, np0, nq0, nq1, nq2)
      } else {
        val ap = math.abs(ps(2) - ps(0)) < b
        val aq = math.abs(qs(2) - qs(0)) < b
        val tc = t0 + (if (ap) 1 else 0) + (if (aq) 1 else 0)
        val raw = math.floorDiv((qs(0) - ps(0)) * 4 + ps(1) - qs(1) + 4, 8)
        val dl = math.max(-tc, math.min(tc, raw))
        val half = (ps(0) + qs(0) + 1) / 2
        val np1 = if (ap)
          ps(1) + math.max(-t0, math.min(t0, math.floorDiv(ps(2) + half - 2 * ps(1), 2)))
        else ps(1)
        val nq1 = if (aq)
          qs(1) + math.max(-t0, math.min(t0, math.floorDiv(qs(2) + half - 2 * qs(1), 2)))
        else qs(1)
        (ps(2), np1, math.max(0, math.min(255, ps(0) + dl)),
          math.max(0, math.min(255, qs(0) - dl)), nq1, qs(2))
      }
    }
    def chromaEdge(p1: Int, p0: Int, q0: Int, q1: Int, bS: Int, a: Int,
                   b: Int, t0: Int): (Int, Int) = {
      val fire = math.abs(p0 - q0) < a && math.abs(p1 - p0) < b &&
        math.abs(q1 - q0) < b
      if (!fire) (p0, q0)
      else if (bS == 4) ((2 * p1 + p0 + q1 + 2) / 4, (2 * q1 + q0 + p1 + 2) / 4)
      else {
        val tc = t0 + 1
        val raw = math.floorDiv((q0 - p0) * 4 + p1 - q1 + 4, 8)
        val dl = math.max(-tc, math.min(tc, raw))
        (math.max(0, math.min(255, p0 + dl)), math.max(0, math.min(255, q0 - dl)))
      }
    }
    for (mbr <- 0 until h / 16; mbc <- 0 until mbW; vertical <- Seq(true, false)) {
      val mb = mbr * mbW + mbc
      // luma edges
      for (e <- (if ((if (vertical) mbc else mbr) > 0) 0 else 1) to 3;
           line <- 0 until 16) {
        val (cxP, cyP, cxQ, cyQ) =
          if (vertical) (mbc * 4 + e - 1, mbr * 4 + line / 4, mbc * 4 + e, mbr * 4 + line / 4)
          else (mbc * 4 + line / 4, mbr * 4 + e - 1, mbc * 4 + line / 4, mbr * 4 + e)
        val bS = bSOf(cxP, cyP, cxQ, cyQ, e == 0)
        if (bS > 0) {
          val mbP = (cyP / 4) * mbW + cxP / 4
          val qa = (qpLuma(mbP) + qpLuma(mb) + 1) / 2
          val a = H264Deblock.alphaTab(qa)
          val b = H264Deblock.betaTab(qa)
          val t0 = H264Deblock.tc0Of(bS, qa)
          def at(k: Int): (Int, Int) = // sample k of p side (k<0) / q side
            if (vertical) (mbc * 16 + e * 4 + k, mbr * 16 + line)
            else (mbc * 16 + line, mbr * 16 + e * 4 + k)
          val ps = Array.tabulate(4) { i => val (x, yy) = at(-1 - i); yP(yy * w + x) }
          val qs = Array.tabulate(4) { i => val (x, yy) = at(i); yP(yy * w + x) }
          val (p2, p1, p0, q0, q1, q2) = lumaEdge(ps, qs, bS, a, b, t0)
          for ((k, nv) <- Seq(-3 -> p2, -2 -> p1, -1 -> p0, 0 -> q0, 1 -> q1, 2 -> q2)) {
            val (x, yy) = at(k); yP(yy * w + x) = nv
          }
        }
      }
      // chroma edges (offsets 0 and 4 in chroma samples)
      val cwp = w / 2
      for (ce <- (if ((if (vertical) mbc else mbr) > 0) 0 else 1) to 1;
           line <- 0 until 8) {
        val (cxP, cyP, cxQ, cyQ) =
          if (vertical)
            (mbc * 4 + ce * 2 - 1, mbr * 4 + line / 2, mbc * 4 + ce * 2, mbr * 4 + line / 2)
          else (mbc * 4 + line / 2, mbr * 4 + ce * 2 - 1, mbc * 4 + line / 2, mbr * 4 + ce * 2)
        val bS = bSOf(cxP, cyP, cxQ, cyQ, ce == 0)
        if (bS > 0) {
          val mbP = (cyP / 4) * mbW + cxP / 4
          val qa = (qpChroma(mbP) + qpChroma(mb) + 1) / 2
          val a = H264Deblock.alphaTab(qa)
          val b = H264Deblock.betaTab(qa)
          val t0 = H264Deblock.tc0Of(bS, qa)
          def at(k: Int): Int =
            if (vertical) (mbr * 8 + line) * cwp + mbc * 8 + ce * 4 + k
            else (mbr * 8 + ce * 4 + k) * cwp + mbc * 8 + line
          for (pl <- Seq(uP, vP)) {
            val (np0, nq0) = chromaEdge(pl(at(-2)), pl(at(-1)), pl(at(0)),
              pl(at(1)), bS, a, b, t0)
            pl(at(-1)) = np0; pl(at(0)) = nq0
          }
        }
      }
    }
  }

  test("synthetic frame: from-scratch replay matches, bS3 with real deltas") {
    // 3x2 MBs: 0,1 intra (non-uniform: live bS=3 internal edges), 2
    // inter+nz, 3 inter mv (8,0), 4 inter mv (0,0), 5 intra PCM
    val w = 48; val h = 32; val cw = w / 2
    val intra = Array(true, true, false, false, false, true)
    val pcm = Array(false, false, false, false, false, true)
    val qps = Array(28, 34, 28, 30, 28, 28)
    def mbOf(x: Int, yy: Int) = (yy / 16) * 3 + x / 16
    def nz(cx: Int, cy: Int) = {
      val mb = (cy / 4) * 3 + cx / 4
      mb == 2 && (cx + cy) % 3 == 0
    }
    def mv(cx: Int, cy: Int): (Int, Int) = {
      val mb = (cy / 4) * 3 + cx / 4
      if (mb == 3) (8, 0) else (0, 0)
    }
    // content: per-4x4-cell constants inside the intra MBs (bS=3 edges
    // with deltas 0..15), full-range gradients elsewhere (clip exercise)
    val y0 = Array.tabulate(h * w) { i =>
      val x = i % w; val yy = i / w
      mbOf(x, yy) match {
        case 0 => 60 + 5 * (x / 4 % 4) + 11 * (yy / 4 % 4)
        case 1 => 200 + 13 * (x / 4 % 4) - 9 * (yy / 4 % 4)
        case 5 => 90 + 6 * (x / 4 % 2)
        case m => (37 * m + 29 * x + 53 * yy) % 256
      }
    }
    val u0 = Array.tabulate(h * w / 4) { i =>
      val x = i % cw; val yy = i / cw
      (19 * (yy / 8 * 3 + x / 8) + 7 * x + 3 * yy + 40) % 256
    }
    val v0 = Array.tabulate(h * w / 4) { i =>
      val x = i % cw; val yy = i / cw
      (23 * (yy / 8 * 3 + x / 8) + 2 * x + 13 * yy + 90) % 256
    }
    // engine side
    val ey = y0.map(_.toByte); val eu = u0.map(_.toByte); val ev = v0.map(_.toByte)
    val meta = new H264Deblock.DeblockMeta(3, 2)
    for (mb <- 0 until 6) {
      meta.intraMb(mb) = intra(mb); meta.pcmMb(mb) = pcm(mb)
      meta.qpMb(mb) = qps(mb)
    }
    for (cy <- 0 until 8; cx <- 0 until 12 if nz(cx, cy)) meta.markNz(cx, cy)
    val mg = new H264Codec.MotionGrid(3, 2)
    for (cy <- 0 until 8; cx <- 0 until 12) {
      val (mx, my) = mv(cx, cy)
      val mb = (cy / 4) * 3 + cx / 4
      mg.fill(cx, cy, 1, 1, if (intra(mb)) -1 else 0, mx, my)
    }
    // MotionGrid.fill sets ref; intra cells keep -1 semantics via ref
    H264Deblock.filterFrame(ey, eu, ev, w, h, meta, mg, -6, 0, 0)
    // replay side
    val ry = y0.clone(); val ru = u0.clone(); val rv = v0.clone()
    replay(ry, ru, rv, w, h, intra, pcm, qps, nz, mv, -6)
    assert(ey.map(_ & 0xff).toSeq == ry.toSeq, "luma mismatch vs replay")
    assert(eu.map(_ & 0xff).toSeq == ru.toSeq, "Cb mismatch vs replay")
    assert(ev.map(_ & 0xff).toSeq == rv.toSeq, "Cr mismatch vs replay")
    // the replay must have actually moved bS=3 internal samples
    assert(ry.toSeq != y0.toSeq, "bS=3 edges were expected to fire")
    // and the PCM MB (QP 0 -> alpha 0) must be untouched
    for (yy <- 16 until 32; x <- 32 until 48)
      assert(ry(yy * w + x) == y0(yy * w + x), s"PCM sample ($x,$yy) moved")
  }

  // ---- 3. entropy-backend parity ---------------------------------------------

  test("CABAC and CAVLC decode to the same deblocked frames") {
    for (d <- Seq(1L, 2L); colv <- Seq(true, false)) {
      val a = H264Codec.decodeSequence(
        H264Codec.encodeIntra(Multimodal.h264DeblockIntraPlan(d, colv), deblock = true))
      val b = H264Codec.decodeSequence(
        H264Codec.encodeIntra(Multimodal.h264DeblockIntraPlan(d, colv),
          cabac = true, deblock = true))
      assert(a.head.y.toSeq == b.head.y.toSeq && a.head.u.toSeq == b.head.u.toSeq &&
        a.head.v.toSeq == b.head.v.toSeq)
      val ai = H264Codec.decodeSequence(
        H264Codec.encodeInter(Multimodal.h264DeblockInterPlan(d, colv), deblockP = true))
      val bi = H264Codec.decodeSequence(
        H264Codec.encodeInter(Multimodal.h264DeblockInterPlan(d, colv),
          cabac = true, deblockP = true))
      for (fi <- 0 to 1)
        assert(ai(fi).y.toSeq == bi(fi).y.toSeq && ai(fi).u.toSeq == bi(fi).u.toSeq &&
          ai(fi).v.toSeq == bi(fi).v.toSeq)
    }
  }
}
