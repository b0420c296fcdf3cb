package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** TEMPORAL direct B prediction (8.4.1.2.3), graded against a
  * hand-derived replay written independently of the codec: the
  * display-reordered B (poc 1 between the IDR at 0 and the reference P
  * at 2) flips the POC-default lists, samples the colocated P motion
  * per 4x4 cell, and scales it through DistScaleFactor — with tb/td =
  * 1/2 that is mvL0 = (128·mvCol + 128) >> 8 (floor at the exact .5 in
  * BOTH sign directions: +128 -> +64, -128 -> -64) and mvL1 = mvL0 −
  * mvCol. The intra-colocated fallback (mvCol = 0), the per-quadrant
  * colocated P_8x8, the edge-clamped colocated fetch, and the flipped
  * explicit-list tooth (B_L0 at zero mv must read the IDR, not the P
  * frame) are each pinned to a distinct constant. Both entropy
  * backends must agree.
  */
class H264TDirectSpec extends AnyFunSuite {

  // expected per-plane constants, derived from the plan geometry by
  // hand (NOT via the codec's MC/scaling code): value at macroblock mi,
  // strip-half qs, cross-half qt
  private def expected(d: Long): (Int, Int, Int, Int, Int) => Int = {
    def a0(m: Int) = ((37 * d + 19 * m) % 160 + 24).toInt
    def b0(m: Int) = ((41 * d + 23 * m) % 160 + 24).toInt
    def acb(m: Int) = ((91 * d + 29 * m) % 160 + 24).toInt
    def acr(m: Int) = ((53 * d + 31 * m) % 160 + 24).toInt
    def bcb(m: Int) = ((67 * d + 17 * m) % 160 + 24).toInt
    def bcr(m: Int) = ((71 * d + 13 * m) % 160 + 24).toInt
    def avg(x: Int, y: Int) = (x + y + 1) >> 1
    (fi: Int, pl: Int, mi: Int, qs: Int, qt: Int) => {
      val a: Int => Int = pl match {
        case 0 => a0
        case 1 => acb
        case _ => acr
      }
      val b: Int => Int = pl match {
        case 0 => b0
        case 1 => bcb
        case _ => bcr
      }
      fi match {
        case 0 => a(mi) // IDR: steered constants
        case 1 => mi match { // P: intra, quadrant motion, ±2 MB, clamp, zero
          case 0 => b(0)
          case 1 => (qs, qt) match {
            case (0, 0) => a(3) // mvCol +2 MB
            case (1, 0) => a(0) // mvCol -1 MB
            case (0, 1) => a(1) // mvCol 0
            case _      => a(2) // mvCol +1 MB
          }
          case 2 => a(0) // -2 MB
          case 3 => a(4) // +2 MB, edge-clamped
          case _ => a(4) // zero mv
        }
        case _ => mi match { // temporal B: scaled halves of the colocated mvs
          case 0 => avg(a(0), b(0)) // intra colocated: zero mvs, bi
          case 1 => (qs, qt) match {
            case (0, 0) => avg(a(2), b(0)) // mvCol 128: l0 +1 MB, l1 -1 MB
            case (1, 0) => avg(a(1), a(0)) // mvCol -64: l0 -8px, l1 +8px
            case (0, 1) => a(1) // mvCol 0
            case _      => avg(a(2), a(1)) // mvCol 64: l0 +8px, l1 -8px
          }
          case 2 => avg(a(1), a(4)) // mvCol -128: l0 -1 MB, l1 +1 MB
          case 3 => a(3) // explicit B_L0 zero mv: flipped list -> IDR
          case _ => a(4) // zero colocated mv
        }
      }
    }
  }

  test("temporal direct scaling matches the hand-derived constants") {
    for (d <- 0L until 16L) {
      val colv = d % 2 == 0
      val exp = expected(d)
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264TDirectPlan(d, colv), cabac = d % 4 == 3))
      assert(frames.length == 3)
      val (w, h) = (frames(0).width, frames(0).height)
      assert((w, h) == (if (colv) (80, 16) else (16, 80)))
      def check(fi: Int, pl: Int, got: Array[Byte], pw: Int, ph: Int,
                mbSpan: Int): Unit =
        for (y <- 0 until ph; x <- 0 until pw) {
          val (s, t) = if (colv) (x, y) else (y, x)
          val mi = s / mbSpan
          val qs = (s % mbSpan) / (mbSpan / 2)
          val qt = t / (mbSpan / 2)
          assert((got(y * pw + x) & 0xff) == exp(fi, pl, mi, qs, qt),
            s"frame $fi plane $pl ($x,$y) d=$d")
        }
      for (fi <- 0 to 2) {
        check(fi, 0, frames(fi).y, w, h, 16)
        check(fi, 1, frames(fi).u, w / 2, h / 2, 8)
        check(fi, 2, frames(fi).v, w / 2, h / 2, 8)
      }
    }
  }

  test("entropy backends agree on temporal direct streams") {
    for (d <- Seq(0L, 1L, 2L, 5L)) {
      val plan = Multimodal.h264TDirectPlan(d, colv = d % 2 == 0)
      val a = H264Codec.decodeSequence(H264Codec.encodeInter(plan))
      val b = H264Codec.decodeSequence(H264Codec.encodeInter(plan, cabac = true))
      for (fi <- 0 to 2)
        assert(a(fi).y.toSeq == b(fi).y.toSeq && a(fi).u.toSeq == b(fi).u.toSeq &&
          a(fi).v.toSeq == b(fi).v.toSeq, s"d=$d frame $fi")
    }
  }
}
