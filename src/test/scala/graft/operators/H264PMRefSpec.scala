package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Multi-reference P sub-partitions, graded against a hand-derived
  * replay written independently of the codec: a plain P slice with two
  * active list-0 references where 16x8/8x16 partitions and P_8x8
  * sub-MBs each carry their own te() ref_idx — reference 0 reads the P
  * frame's constants B(m), reference 1 the IDR's A(m), so a swapped or
  * mis-scoped reference surfaces as the wrong constant family. Mixed
  * sub shapes, an edge-clamped vector, and ref-matched MV prediction
  * across partitions. Both entropy backends must agree (CAVLC te()
  * bits vs the CABAC unary ref_idx bins with neighbor contexts).
  */
class H264PMRefSpec extends AnyFunSuite {

  private def expected(d: Long): (Int, Int, Int, Int, Int, Int, Int) => Int = {
    def a0(m: Int) = ((37 * d + 19 * m) % 160 + 24).toInt
    def b0(m: Int) = ((41 * d + 23 * m) % 160 + 24).toInt
    def acb(m: Int) = ((91 * d + 29 * m) % 160 + 24).toInt
    def acr(m: Int) = ((53 * d + 31 * m) % 160 + 24).toInt
    def bcb(m: Int) = ((67 * d + 17 * m) % 160 + 24).toInt
    def bcr(m: Int) = ((71 * d + 13 * m) % 160 + 24).toInt
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
          case 0 => if (qt == 0) b(0) else a(1) // ref 0 / ref 1 across the split
          case 1 => if (qs == 0) a(1) else b(0)
          case 2 => (qs, qt) match {
            case (0, 0) => a(4) // ref1 8x8, +2 MB
            case (1, 0) => if (us == 0) b(2) else b(3) // ref0 strip pair
            case (0, 1) => if (ut == 0) a(1) else a(2) // ref1 cross pair
            case _ => (us, ut) match { // ref0 4x4 quartet
              case (0, 0) => b(2)
              case (1, 0) => b(3)
              case (0, 1) => b(1)
              case _      => b(3)
            }
          }
          case 3 => if (qt == 0) a(2) else a(4) // both partitions ref1
          case _ => (qs, qt) match {
            case (0, 0) => b(3) // ref0, -1 MB
            case (1, 0) => a(4) // ref1, edge-clamped
            case (0, 1) => b(4) // ref0, +8 px
            case _      => a(0) // ref1, -4 MB
          }
        }
      }
    }
  }

  test("per-partition references match the hand-derived constants") {
    for (d <- 0L until 16L) {
      val colv = d % 2 == 0
      val exp = expected(d)
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264PMRefPlan(d, colv), cabac = d % 4 == 3))
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

  test("entropy backends agree on multi-reference partition streams") {
    for (d <- Seq(0L, 1L, 2L, 5L)) {
      val plan = Multimodal.h264PMRefPlan(d, colv = d % 2 == 0)
      val a = H264Codec.decodeSequence(H264Codec.encodeInter(plan))
      val b = H264Codec.decodeSequence(H264Codec.encodeInter(plan, cabac = true))
      for (fi <- 0 to 2)
        assert(a(fi).y.toSeq == b(fi).y.toSeq && a(fi).u.toSeq == b(fi).u.toSeq &&
          a(fi).v.toSeq == b(fi).v.toSeq, s"d=$d frame $fi")
    }
  }
}
