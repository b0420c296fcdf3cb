package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Per-partition weighted multi-reference prediction: an explicit
  * two-reference pred_weight_table where every 16x8/8x16 partition and
  * P_8x8 sub-MB applies the weight pair of ITS OWN reference —
  * w(v) = clip(((w·v + 1) >> 1) + o) with (3,4)-family weights on
  * reference 0 and (1,-2)-family on reference 1. Indexing the table by
  * a single whole-MB reference shifts every mixed-reference MB.
  */
class H264WPartSpec extends AnyFunSuite {

  private def expected(d: Long): (Int, Int, Int, Int, Int, Int, Int) => Int = {
    def a0(m: Int) = ((37 * d + 19 * m) % 160 + 24).toInt
    def b0(m: Int) = ((41 * d + 23 * m) % 160 + 24).toInt
    def acb(m: Int) = ((91 * d + 29 * m) % 160 + 24).toInt
    def acr(m: Int) = ((53 * d + 31 * m) % 160 + 24).toInt
    def bcb(m: Int) = ((67 * d + 17 * m) % 160 + 24).toInt
    def bcr(m: Int) = ((71 * d + 13 * m) % 160 + 24).toInt
    def clip(v: Int) = math.max(0, math.min(255, v))
    // weight pairs per (plane, ref)
    def wp(pl: Int, ref: Int, v: Int): Int = {
      val (w, o) = (pl, ref) match {
        case (0, 0) => (3, 4)
        case (0, _) => (1, -2)
        case (1, 0) => (3, 2)
        case (1, _) => (1, 6)
        case (_, 0) => (3, -2)
        case _      => (1, 4)
      }
      clip(((w * v + 1) >> 1) + o)
    }
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
        case 1 => b(mi) // identity table on the reference P frame
        case _ => mi match {
          case 0 => if (qt == 0) wp(pl, 0, b(0)) else wp(pl, 1, a(1))
          case 1 => if (qs == 0) wp(pl, 1, a(1)) else wp(pl, 0, b(0))
          case 2 => (qs, qt) match {
            case (0, 0) => wp(pl, 1, a(4))
            case (1, 0) => wp(pl, 0, if (us == 0) b(2) else b(3))
            case (0, 1) => wp(pl, 1, if (ut == 0) a(1) else a(2))
            case _ => wp(pl, 0, (us, ut) match {
              case (0, 0) => b(2)
              case (1, 0) => b(3)
              case (0, 1) => b(1)
              case _      => b(3)
            })
          }
          case 3 => wp(pl, 1, if (qt == 0) a(2) else a(4))
          case _ => (qs, qt) match {
            case (0, 0) => wp(pl, 0, b(3))
            case (1, 0) => wp(pl, 1, a(4))
            case (0, 1) => wp(pl, 0, b(4))
            case _      => wp(pl, 1, a(0))
          }
        }
      }
    }
  }

  test("per-partition weights match the hand-derived constants") {
    for (d <- 0L until 16L) {
      val colv = d % 2 == 0
      val exp = expected(d)
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264WPartPlan(d, colv), cabac = d % 4 == 3))
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

  test("weights are per-partition, not whole-MB") {
    // a mixed-reference MB under asymmetric weights differs from both
    // single-table renderings: compare against the unweighted stream
    val d = 0L
    val a = H264Codec.decodeSequence(H264Codec.encodeInter(
      Multimodal.h264WPartPlan(d, colv = true)))
    val b = H264Codec.decodeSequence(H264Codec.encodeInter(
      Multimodal.h264PMRefPlan(d, colv = true)))
    assert(a(2).y.toSeq != b(2).y.toSeq)
  }
}
