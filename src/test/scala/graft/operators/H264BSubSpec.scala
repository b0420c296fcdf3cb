package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** B sub-16x16 partitions, graded against a hand-derived replay written
  * independently of the codec: two-partition 16x8/8x16 MBs with
  * one-sided ((L0,L1), (L1,L0)) and (Bi,Bi) pairs, and B_8x8 MBs
  * covering Direct_8x8 (zero-prediction AND derived-from-neighbor
  * cases), one-sided 8x8/8x4/4x8 pairs, a Bi 8x8, and an L0 4x4
  * quartet with an edge-clamped vector. Every partition's fetch lands
  * on a distinct per-MB constant, so a wrong split shape, swapped
  * list, wrong syntax order, or wrong sub-partition decomposition all
  * surface as the wrong constant. Both entropy backends must agree
  * (the extended pinned CABAC B mb_type tree and the 4-bin
  * sub_mb_type binarization).
  */
class H264BSubSpec extends AnyFunSuite {

  // expected frame-2 constants derived from the plan geometry by hand:
  // macroblock mi, strip/cross halves (qs, qt), sub-halves (us, ut)
  private def expected(d: Long): (Int, Int, Int, Int, Int, Int, Int) => Int = {
    def a0(m: Int) = ((37 * d + 19 * m) % 160 + 24).toInt
    def b0(m: Int) = ((41 * d + 23 * m) % 160 + 24).toInt
    def acb(m: Int) = ((91 * d + 29 * m) % 160 + 24).toInt
    def acr(m: Int) = ((53 * d + 31 * m) % 160 + 24).toInt
    def bcb(m: Int) = ((67 * d + 17 * m) % 160 + 24).toInt
    def bcr(m: Int) = ((71 * d + 13 * m) % 160 + 24).toInt
    def avg(x: Int, y: Int) = (x + y + 1) >> 1
    (fi: Int, pl: Int, mi: Int, qs: Int, qt: Int, us: Int, ut: Int) => {
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
        case 0 => a(mi)
        case 1 => b(mi)
        case _ => mi match {
          case 0 => (qs, qt) match {
            case (0, 0) => avg(b(0), a(0)) // direct: zero-pred bi
            case (1, 0) => if (us == 0) b(0) else b(1) // L0 strip pair
            case (0, 1) => if (ut == 0) a(1) else a(0) // L1 cross pair
            case _      => avg(b(1), a(2)) // Bi 8x8
          }
          case 1 => if (qt == 0) b(1) else a(2) // (L0, L1) cross split
          case 2 => if (qs == 0) a(1) else b(3) // (L1, L0) strip split
          case 3 => if (qt == 0) avg(b(2), a(3)) else avg(b(4), a(1)) // (Bi, Bi)
          case _ => (qs, qt) match {
            case (0, 0) => (us, ut) match { // L0 4x4 quartet
              case (0, 0) => b(4)
              case (1, 0) => b(3)
              case (0, 1) => b(2)
              case _      => b(3)
            }
            case (1, 0) => a(0) // L1 8x8, -4 MB
            case (0, 1) => avg(b(3), a(4)) // direct from m3's bi cells
            case _      => if (ut == 0) b(4) else b(1) // L0 pair, clamp / -3 MB
          }
        }
      }
    }
  }

  test("sub-16x16 partitions match the hand-derived constants") {
    for (d <- 0L until 16L) {
      val colv = d % 2 == 0
      val exp = expected(d)
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264BSubPlan(d, colv), cabac = d % 4 == 3))
      assert(frames.length == 3)
      val (w, h) = (frames(0).width, frames(0).height)
      def check(fi: Int, pl: Int, got: Array[Byte], pw: Int, ph: Int,
                mbSpan: Int): Unit =
        for (y <- 0 until ph; x <- 0 until pw) {
          val (s, t) = if (colv) (x, y) else (y, x)
          val mi = s / mbSpan
          val qs = (s % mbSpan) / (mbSpan / 2)
          val qt = t / (mbSpan / 2)
          val us = (s % (mbSpan / 2)) / (mbSpan / 4)
          val ut = (t % (mbSpan / 2)) / (mbSpan / 4)
          assert((got(y * pw + x) & 0xff) == exp(fi, pl, mi, qs, qt, us, ut),
            s"frame $fi plane $pl ($x,$y) d=$d")
        }
      for (fi <- 0 to 2) {
        check(fi, 0, frames(fi).y, w, h, 16)
        check(fi, 1, frames(fi).u, w / 2, h / 2, 8)
        check(fi, 2, frames(fi).v, w / 2, h / 2, 8)
      }
    }
  }

  test("entropy backends agree on sub-partition streams") {
    for (d <- Seq(0L, 1L, 2L, 5L)) {
      val plan = Multimodal.h264BSubPlan(d, colv = d % 2 == 0)
      val a = H264Codec.decodeSequence(H264Codec.encodeInter(plan))
      val b = H264Codec.decodeSequence(H264Codec.encodeInter(plan, cabac = true))
      for (fi <- 0 to 2)
        assert(a(fi).y.toSeq == b(fi).y.toSeq && a(fi).u.toSeq == b(fi).u.toSeq &&
          a(fi).v.toSeq == b(fi).v.toSeq, s"d=$d frame $fi")
    }
  }
}
