package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** B_Skip and B_Direct_16x16 with SPATIAL direct derivation, graded
  * against hand-derived expectations: the per-list MinPositive
  * reference over steered neighbors, mv inheritance through the median
  * predictor, the zero-prediction clause, and chained derivations
  * (skip after direct). Both entropy backends must agree.
  */
class H264BDirectSpec extends AnyFunSuite {

  test("direct derivation chains match the hand-derived values") {
    for (d <- 0L until 16L) {
      val colv = d % 2 == 0
      val layout1 = (d / 2) % 2 == 1
      def a0(m: Int) = ((37 * d + 19 * m) % 160 + 24).toInt
      def b0(m: Int) = ((41 * d + 23 * m) % 160 + 24).toInt
      def acb(m: Int) = ((91 * d + 29 * m) % 160 + 24).toInt
      def acr(m: Int) = ((53 * d + 31 * m) % 160 + 24).toInt
      def bcb(m: Int) = ((67 * d + 17 * m) % 160 + 24).toInt
      def bcr(m: Int) = ((71 * d + 13 * m) % 160 + 24).toInt
      def avg(x: Int, y: Int) = (x + y + 1) >> 1
      val (vy, vcb, vcr) =
        if (!layout1) (
          Array(b0(1), b0(2), a0(2), a0(3), a0(4)),
          Array(bcb(1), bcb(2), acb(2), acb(3), acb(4)),
          Array(bcr(1), bcr(2), acr(2), acr(3), acr(4)))
        else (
          Array(avg(b0(0), a0(0)), ((43 * d + 11) % 160 + 24).toInt,
            avg(b0(2), a0(2)), b0(3), b0(4)),
          Array(avg(bcb(0), acb(0)), ((23 * d + 7) % 160 + 24).toInt,
            avg(bcb(2), acb(2)), bcb(3), bcb(4)),
          Array(avg(bcr(0), acr(0)), ((83 * d + 3) % 160 + 24).toInt,
            avg(bcr(2), acr(2)), bcr(3), bcr(4)))
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264BDirectPlan(d, colv), cabac = d % 4 == 3))
      assert(frames.length == 3)
      val (w, h) = (frames(0).width, frames(0).height)
      def check(name: String, got: Array[Byte], pw: Int, ph: Int,
                line: Int => Int): Unit =
        for (y <- 0 until ph; x <- 0 until pw) {
          val s = if (colv) x else y
          assert((got(y * pw + x) & 0xff) == line(s), s"$name($x,$y) d=$d")
        }
      check("f1 Y", frames(0).y, w, h, s => a0(s / 16))
      check("f2 Y", frames(1).y, w, h, s => b0(s / 16))
      check("f3 Y", frames(2).y, w, h, s => vy(s / 16))
      check("f3 U", frames(2).u, w / 2, h / 2, s => vcb(s / 8))
      check("f3 V", frames(2).v, w / 2, h / 2, s => vcr(s / 8))
    }
  }

  test("entropy backends agree on skip/direct streams") {
    for (d <- Seq(0L, 1L, 2L, 5L)) {
      val plan = Multimodal.h264BDirectPlan(d, colv = d % 2 == 0)
      val a = H264Codec.decodeSequence(H264Codec.encodeInter(plan))
      val b = H264Codec.decodeSequence(H264Codec.encodeInter(plan, cabac = true))
      for (fi <- 0 to 2)
        assert(a(fi).y.toSeq == b(fi).y.toSeq && a(fi).u.toSeq == b(fi).u.toSeq &&
          a(fi).v.toSeq == b(fi).v.toSeq, s"d=$d frame $fi")
    }
  }
}
