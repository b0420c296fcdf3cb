package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** H.264 reference-picture-list modification (7.3.3.1 / 8.2.4.3),
  * graded against a hand-derived replay: one idc-0 command with
  * abs_diff_pic_num_minus1 = 1 names picNum 0 (the IDR) from
  * CurrPicNum 2, flipping list 0 from the default [P, IDR] to
  * [IDR, P]. The fixture reuses the multi-reference sub-partition
  * geometry, so every expected constant is the OTHER frame's — a
  * decoder ignoring the modification reproduces the un-flipped
  * q_h264_pmref table instead and fails everywhere a partition fetches.
  */
class H264ReorderSpec extends AnyFunSuite {

  // the pmref expected table with the two constant families swapped
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
          case 0 => if (qt == 0) a(0) else b(1) // ref 0 = IDR now
          case 1 => if (qs == 0) b(1) else a(0)
          case 2 => (qs, qt) match {
            case (0, 0) => b(4) // ref1 = P frame now
            case (1, 0) => if (us == 0) a(2) else a(3)
            case (0, 1) => if (ut == 0) b(1) else b(2)
            case _ => (us, ut) match {
              case (0, 0) => a(2)
              case (1, 0) => a(3)
              case (0, 1) => a(1)
              case _      => a(3)
            }
          }
          case 3 => if (qt == 0) b(2) else b(4)
          case _ => (qs, qt) match {
            case (0, 0) => a(3)
            case (1, 0) => b(4) // edge-clamped on the P frame
            case (0, 1) => a(4)
            case _      => b(0)
          }
        }
      }
    }
  }

  test("the permuted list resolves every partition's reference") {
    for (d <- 0L until 16L) {
      val colv = d % 2 == 0
      val exp = expected(d)
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264ReorderPlan(d, colv), cabac = d % 4 == 3))
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

  test("the modification is value-visible against the default order") {
    for (d <- Seq(0L, 1L)) {
      val a = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264ReorderPlan(d, colv = d % 2 == 0)))
      val b = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264PMRefPlan(d, colv = d % 2 == 0)))
      assert(a(2).y.toSeq != b(2).y.toSeq, s"d=$d")
    }
  }
}
