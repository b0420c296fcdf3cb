package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** B-slice deblocking: the two-list boundary-strength rules (different
  * reference SETS, per-PICTURE mv distance, same-pic-same-mv zero) and
  * the filtered B output, graded against hand-derived closed forms plus
  * direct unit coverage of the strength derivation.
  */
class H264BDeblockSpec extends AnyFunSuite {

  private def clip(lo: Int, hi: Int, v: Int) = math.max(lo, math.min(hi, v))

  /** bS=1 weak filter on a flat L|R boundary (QP 28: α=20, β=7, tC0=1):
    * returns (p1', p0', q0', q1') or None when the edge must not fire.
    */
  private def bs1(l: Int, r: Int, alpha: Int, tc0: Int): Option[(Int, Int, Int, Int)] = {
    val dd = r - l
    if (math.abs(dd) >= alpha) None
    else {
      val tc = tc0 + 2
      val delta = clip(-tc, tc, (3 * dd + 4) >> 3)
      val half = (l + r + 1) >> 1
      val p1 = l + clip(-tc0, tc0, (half - l) >> 1)
      val q1 = r + clip(-tc0, tc0, (half - r) >> 1)
      Some((p1, l + delta, r - delta, q1))
    }
  }

  /** chroma bS=1 (QP 22: α=9, tC0=1 → tC=2): (p0', q0') or None. */
  private def bs1c(l: Int, r: Int): Option[(Int, Int)] = {
    val dd = r - l
    if (math.abs(dd) >= 9) None
    else {
      // flat sides: p1 - q1 = -dd, so the numerator is 3*dd + 4
      val delta = clip(-2, 2, (3 * dd + 4) >> 3)
      Some((l + delta, r - delta))
    }
  }

  test("B frame: reference-set and per-picture-mv strengths — closed form") {
    for (d <- 0L until 16L) {
      val colv = d % 2 == 0
      val variantY = d % 4 >= 2
      val range = if (variantY) 80 else 170
      def a0(m: Int) = (30 + (31 * d + 17 * m) % range).toInt
      def b0(m: Int) = (30 + (41 * d + 23 * m) % range).toInt
      def acb(m: Int) = (30 + (91 * d + 29 * m) % range).toInt
      def acr(m: Int) = (30 + (53 * d + 31 * m) % range).toInt
      def bcb(m: Int) = (30 + (67 * d + 19 * m) % range).toInt
      def bcr(m: Int) = (30 + (71 * d + 13 * m) % range).toInt
      def iL(m: Int) = (140 + (43 * d + 11 * m) % 80).toInt
      def iCb(m: Int) = (140 + (23 * d + 7 * m) % 80).toInt
      def iCr(m: Int) = (140 + (83 * d + 3 * m) % 80).toInt
      def avg(x: Int, y: Int) = (x + y + 1) >> 1
      // frame-3 MB values and per-boundary strengths
      val (vals, cbs, crs, bS) =
        if (!variantY) (
          Array(b0(0), a0(1), avg(b0(2), a0(2)), b0(3), b0(4)),
          Array(bcb(0), acb(1), avg(bcb(2), acb(2)), bcb(3), bcb(4)),
          Array(bcr(0), acr(1), avg(bcr(2), acr(2)), bcr(3), bcr(4)),
          Array(1, 1, 1, 0))
        else (
          Array(b0(0), avg(b0(2), a0(1)), avg(b0(2), a0(2)), iL(3), a0(4)),
          Array(bcb(0), avg(bcb(2), acb(1)), avg(bcb(2), acb(2)), iCb(3), acb(4)),
          Array(bcr(0), avg(bcr(2), acr(1)), avg(bcr(2), acr(2)), iCr(3), acr(4)),
          Array(1, 1, 4, 4)) // bS4 edges never fire: |Δ| >= 30 >= α
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264BDeblockPlan(d, colv), deblockB = true))
      assert(frames.length == 3)
      def checkPlane(name: String, got: Array[Byte], w: Int, h: Int,
                     line: Int => Int): Unit =
        for (y <- 0 until h; x <- 0 until w) {
          val s = if (colv) x else y
          assert((got(y * w + x) & 0xff) == line(s), s"$name($x,$y) d=$d")
        }
      val (w, h) = (frames(0).width, frames(0).height)
      checkPlane("f1 Y", frames(0).y, w, h, s => a0(s / 16))
      checkPlane("f1 U", frames(0).u, w / 2, h / 2, s => acb(s / 8))
      checkPlane("f2 Y", frames(1).y, w, h, s => b0(s / 16))
      // frame 3: bases plus the bS=1 boundary overrides
      val lum = Array.tabulate(80)(s => vals(s / 16))
      val cbl = Array.tabulate(40)(s => cbs(s / 8))
      val crl = Array.tabulate(40)(s => crs(s / 8))
      for (k <- 1 to 4; if bS(k - 1) == 1) {
        bs1(vals(k - 1), vals(k), alpha = 20, tc0 = 1).foreach {
          case (p1, p0, q0, q1) =>
            lum(16 * k - 2) = p1; lum(16 * k - 1) = p0
            lum(16 * k) = q0; lum(16 * k + 1) = q1
        }
        bs1c(cbs(k - 1), cbs(k)).foreach { case (p0, q0) =>
          cbl(8 * k - 1) = p0; cbl(8 * k) = q0
        }
        bs1c(crs(k - 1), crs(k)).foreach { case (p0, q0) =>
          crl(8 * k - 1) = p0; crl(8 * k) = q0
        }
      }
      checkPlane("f3 Y", frames(2).y, w, h, lum)
      checkPlane("f3 U", frames(2).u, w / 2, h / 2, cbl)
      checkPlane("f3 V", frames(2).v, w / 2, h / 2, crl)
    }
  }

  test("strength unit rules: sets, per-picture mvs, zero, intra") {
    val meta = new H264Deblock.DeblockMeta(2, 1)
    java.util.Arrays.fill(meta.qpMb, 28)
    val mg0 = new H264Codec.MotionGrid(2, 1)
    val mg1 = new H264Codec.MotionGrid(2, 1)
    def set(cell: Int, r0: Int, mv0: (Int, Int), r1: Int, mv1: (Int, Int)): Unit = {
      mg0.ref(cell) = r0; mg0.mvx(cell) = mv0._1; mg0.mvy(cell) = mv0._2
      mg1.ref(cell) = r1; mg1.mvx(cell) = mv1._1; mg1.mvy(cell) = mv1._2
    }
    def bs = H264Deblock.strength(meta, mg0, mg1, 3, 0, 4, 0, mbBoundary = true)
    // L0-only vs L1-only: different picture sets
    set(3, 0, (0, 0), -1, (0, 0)); set(4, -1, (0, 0), 0, (0, 0))
    assert(bs == 1)
    // bi vs bi, same pictures, pic-0 mvs 4 qpel apart
    set(3, 0, (4, 0), 0, (0, 0)); set(4, 0, (0, 0), 0, (0, 0))
    assert(bs == 1)
    // bi vs bi, same pictures, mvs within 3 qpel
    set(3, 0, (3, 0), 0, (0, -3)); set(4, 0, (0, 0), 0, (0, 0))
    assert(bs == 0)
    // multi-ref P view: list-0 refIdx IS the picture — different refs
    set(3, 1, (0, 0), -1, (0, 0)); set(4, 0, (0, 0), -1, (0, 0))
    assert(H264Deblock.strength(meta, mg0, null, 3, 0, 4, 0, mbBoundary = true) == 1)
    // intra wins regardless
    meta.intraMb(1) = true
    assert(bs == 4)
  }
}
