package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** H.264 P sub-8x8 partitions (P_L0_8x4 / 4x8 / 4x4), graded against a
  * hand-derived per-pixel map: quadrant sub_mb_types rotate through all
  * four shapes and every sub-partition independently picks its source
  * region, so decode order, per-sub-rect MC geometry, and the
  * written-cell MV prediction are each value-visible. Both entropy
  * backends must agree (the pinned CABAC sub_mb_type bin tree).
  */
class H264P4x4Spec extends AnyFunSuite {

  test("sub-partition family matches the per-pixel map") {
    for (d <- 0L until 16L) {
      val colv = d % 2 == 0
      def a0(m: Int) = ((37 * d + 19 * m) % 160 + 24).toInt
      def acb(m: Int) = ((91 * d + 29 * m) % 160 + 24).toInt
      def acr(m: Int) = ((53 * d + 31 * m) % 160 + 24).toInt
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264P4x4Plan(d, colv), cabac = d % 4 == 1))
      assert(frames.length == 2)
      val (w, h) = (frames(0).width, frames(0).height)
      def srcOf(m: Int, x: Int, y: Int, chroma: Boolean): Int =
        if (m == 0) m
        else {
          val (k, j) =
            if (!chroma) {
              val k0 = ((y % 16) / 8) * 2 + (x % 16) / 8
              val t = ((d + m + k0) % 4).toInt
              val j0 = t match {
                case 0 => 0
                case 1 => (y % 8) / 4
                case 2 => (x % 8) / 4
                case _ => ((y % 8) / 4) * 2 + (x % 8) / 4
              }
              (k0, j0)
            } else {
              val k0 = ((y % 8) / 4) * 2 + (x % 8) / 4
              val t = ((d + m + k0) % 4).toInt
              val j0 = t match {
                case 0 => 0
                case 1 => (y % 4) / 2
                case 2 => (x % 4) / 2
                case _ => ((y % 4) / 2) * 2 + (x % 4) / 2
              }
              (k0, j0)
            }
          if ((d + m + k + j) % 2 == 0) m else m - 1
        }
      for (y <- 0 until h; x <- 0 until w) {
        val m = (if (colv) x else y) / 16
        val want = a0(srcOf(m, x, y, chroma = false))
        assert((frames(1).y(y * w + x) & 0xff) == want, s"d=$d Y($x,$y)")
      }
      for (y <- 0 until h / 2; x <- 0 until w / 2) {
        val m = (if (colv) x else y) / 8
        val s = srcOf(m, x, y, chroma = true)
        assert((frames(1).u(y * w / 2 + x) & 0xff) == acb(s), s"d=$d U($x,$y)")
        assert((frames(1).v(y * w / 2 + x) & 0xff) == acr(s), s"d=$d V($x,$y)")
      }
    }
  }

  test("entropy backends agree on sub-partitioned streams") {
    for (d <- Seq(0L, 2L, 3L)) {
      val plan = Multimodal.h264P4x4Plan(d, colv = d % 2 == 0)
      val a = H264Codec.decodeSequence(H264Codec.encodeInter(plan))
      val b = H264Codec.decodeSequence(H264Codec.encodeInter(plan, cabac = true))
      for (fi <- 0 to 1)
        assert(a(fi).y.toSeq == b(fi).y.toSeq && a(fi).u.toSeq == b(fi).u.toSeq &&
          a(fi).v.toSeq == b(fi).v.toSeq, s"d=$d frame $fi")
    }
  }
}
