package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** H.264 long-term references (8.2.5.4 MMCO 2/3/4/6, the 8.2.4.2.1
  * short-then-long default list order, and 7.3.3.1 idc-2 long-term
  * naming): the four [[Multimodal.h264LtRefPlan]] chain variants
  * replayed per pixel from a hand-derived constant table — the same
  * (reference, source-stripe) map the pmref/mmco fixtures pin, resolved
  * per variant to the IDR constants, the P constants, or the shifted
  * marking-frame constants. A decoder that drops a marking operation
  * either overflows the two-picture DPB (loud) or fetches the wrong
  * picture (checksum moves).
  */
class H264LtRefSpec extends AnyFunSuite {

  /** (reference 0/1, source stripe) of every probe sub-rect, by strip
    * coordinates — the [[Multimodal.h264PMRefPlan]] geometry, derived
    * by hand from its per-quadrant refs/mvs tables.
    */
  private def refSrc(mi: Int, qs: Int, qt: Int, us: Int, ut: Int): (Int, Int) =
    mi match {
      case 0 => if (qt == 0) (0, 0) else (1, 1)
      case 1 => if (qs == 0) (1, 1) else (0, 0)
      case 2 => (qs, qt) match {
        case (0, 0) => (1, 4)
        case (1, 0) => if (us == 0) (0, 2) else (0, 3)
        case (0, 1) => if (ut == 0) (1, 1) else (1, 2)
        case _ => (us, ut) match {
          case (0, 0) => (0, 2)
          case (1, 0) => (0, 3)
          case (0, 1) => (0, 1)
          case _      => (0, 3)
        }
      }
      case 3 => if (qt == 0) (1, 2) else (1, 4)
      case _ => (qs, qt) match {
        case (0, 0) => (0, 3)
        case (1, 0) => (1, 4)
        case (0, 1) => (0, 4)
        case _      => (1, 0)
      }
    }

  test("long-term chains: all four variants replay per pixel") {
    for (d <- 0L until 16L) {
      val colv = d % 2 == 0
      val v = ((d / 2) % 4).toInt
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264LtRefPlan(d, colv), cabac = d % 4 == 3))
      val nf = if (v == 2) 5 else 4
      assert(frames.length == nf, s"d=$d v=$v")
      val (w, h) = if (colv) (80, 16) else (16, 80)
      def aT(pl: Int, k: Int): Int = pl match {
        case 0 => ((37 * d + 19 * k) % 160 + 24).toInt
        case 1 => ((91 * d + 29 * k) % 160 + 24).toInt
        case _ => ((53 * d + 31 * k) % 160 + 24).toInt
      }
      def bT(pl: Int, k: Int): Int = pl match {
        case 0 => ((41 * d + 23 * k) % 160 + 24).toInt
        case 1 => ((67 * d + 17 * k) % 160 + 24).toInt
        case _ => ((71 * d + 13 * k) % 160 + 24).toInt
      }
      def expected(fi: Int, pl: Int, x: Int, y: Int): Int = {
        val span = if (pl == 0) 16 else 8
        val (s, tt) = if (colv) (x, y) else (y, x)
        val mi = s / span
        val qs = (s % span) / (span / 2)
        val qt = tt / (span / 2)
        val us = (s % (span / 2)) / (span / 4)
        val ut = (tt % (span / 2)) / (span / 4)
        if (fi == 0) aT(pl, mi)
        else if (fi == 1) bT(pl, mi)
        else if (fi == 2) { if (v == 1) bT(pl, math.min(mi + 1, 4)) else bT(pl, mi) }
        else if (fi == 3 && v == 2) bT(pl, mi)
        else {
          val (rr, kk) = refSrc(mi, qs, qt, us, ut)
          if (rr == 0) { if (v == 3) aT(pl, kk) else bT(pl, kk) }
          else v match {
            case 0 => aT(pl, kk)
            case 1 => bT(pl, math.min(kk + 1, 4))
            case _ => bT(pl, kk)
          }
        }
      }
      for (fi <- 0 until nf) {
        val fr = frames(fi)
        for (yy <- 0 until h; x <- 0 until w)
          assert((fr.y(yy * w + x) & 0xff) == expected(fi, 0, x, yy),
            s"d=$d v=$v f=$fi y($x,$yy)")
        for (yy <- 0 until h / 2; x <- 0 until w / 2) {
          assert((fr.u(yy * (w / 2) + x) & 0xff) == expected(fi, 1, x, yy),
            s"d=$d v=$v f=$fi u($x,$yy)")
          assert((fr.v(yy * (w / 2) + x) & 0xff) == expected(fi, 2, x, yy),
            s"d=$d v=$v f=$fi v($x,$yy)")
        }
      }
    }
  }

  test("MMCO 5 splice: the reset renumbers the DPB the probe reads") {
    for (d <- 0L until 8L) {
      val colv = d % 2 == 0
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264Mmco5Plan(d, colv), cabac = d % 4 == 3))
      assert(frames.length == 5, s"d=$d")
      val (w, h) = if (colv) (80, 16) else (16, 80)
      def aT(pl: Int, k: Int): Int = pl match {
        case 0 => ((37 * d + 19 * k) % 160 + 24).toInt
        case 1 => ((91 * d + 29 * k) % 160 + 24).toInt
        case _ => ((53 * d + 31 * k) % 160 + 24).toInt
      }
      def bT(pl: Int, k: Int): Int = pl match {
        case 0 => ((41 * d + 23 * k) % 160 + 24).toInt
        case 1 => ((67 * d + 17 * k) % 160 + 24).toInt
        case _ => ((71 * d + 13 * k) % 160 + 24).toInt
      }
      // frames: IDR a, P b, reset copy b, post-reset shifted b(+1),
      // probe: ref 0 = the shifted frame, ref 1 = the reset copy
      def expected(fi: Int, pl: Int, x: Int, y: Int): Int = {
        val span = if (pl == 0) 16 else 8
        val (s, tt) = if (colv) (x, y) else (y, x)
        val mi = s / span
        val qs = (s % span) / (span / 2)
        val qt = tt / (span / 2)
        val us = (s % (span / 2)) / (span / 4)
        val ut = (tt % (span / 2)) / (span / 4)
        if (fi == 0) aT(pl, mi)
        else if (fi == 1 || fi == 2) bT(pl, mi)
        else if (fi == 3) bT(pl, math.min(mi + 1, 4))
        else {
          val (rr, kk) = refSrc(mi, qs, qt, us, ut)
          if (rr == 0) bT(pl, math.min(kk + 1, 4)) else bT(pl, kk)
        }
      }
      for (fi <- 0 until 5) {
        val fr = frames(fi)
        for (yy <- 0 until h; x <- 0 until w)
          assert((fr.y(yy * w + x) & 0xff) == expected(fi, 0, x, yy),
            s"d=$d f=$fi y($x,$yy)")
        for (yy <- 0 until h / 2; x <- 0 until w / 2) {
          assert((fr.u(yy * (w / 2) + x) & 0xff) == expected(fi, 1, x, yy),
            s"d=$d f=$fi u($x,$yy)")
          assert((fr.v(yy * (w / 2) + x) & 0xff) == expected(fi, 2, x, yy),
            s"d=$d f=$fi v($x,$yy)")
        }
      }
    }
  }

  test("the long-term state is what the probe reads, not the sliding window") {
    // variant 0's probe reads the IDR on reference 1 — under a sliding
    // window the IDR would be gone and reference 1 would read P content;
    // assert the probe really differs from an all-P rendering (frame 2)
    val d = 4L // v = (4/2) % 4 = 2? no: (d/2)%4 = 2 -> pick d with v=0
    val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
      Multimodal.h264LtRefPlan(1L, colv = false)))
    assert(((1L / 2) % 4).toInt == 0)
    assert(frames(3).y.toSeq != frames(2).y.toSeq)
    locally { val _ = d }
  }
}
