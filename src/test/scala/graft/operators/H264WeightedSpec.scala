package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** H.264 explicit weighted prediction + two list-0 references, graded
  * against hand-derived closed forms: all three frames of the fixture
  * replayed per pixel, the WP transform computed here from the spec
  * equation (not by calling the codec), plus the loud-reject surface.
  */
class H264WeightedSpec extends AnyFunSuite {

  private def wp(v: Int, w: Int, o: Int, d: Int): Int = {
    val x = if (d > 0) ((w * v + (1 << (d - 1))) >> d) + o else w * v + o
    math.max(0, math.min(255, x))
  }

  test("three frames: IDR, intra-P, then weighted multi-ref P — closed form") {
    for (d <- 0L until 12L) {
      def t1(mb: Int) = ((37 * d + 19 * mb) % 136 + 24).toInt
      def t1cb(mb: Int) = ((91 * d + 29 * (mb / 2 + mb % 2)) % 180 + 12).toInt
      def t1cr(mb: Int) = ((53 * d + 31 * (mb / 2 + mb % 2)) % 180 + 12).toInt
      def t2(mb: Int) = ((41 * d + 23 * mb) % 136 + 24).toInt
      def t2cb(mb: Int) = ((67 * d + 17 * mb) % 180 + 12).toInt
      def t2cr(mb: Int) = ((71 * d + 13 * mb) % 180 + 12).toInt
      val wL = Array((3 + d % 3).toInt, (2 + (d + 1) % 3).toInt)
      val oL = Array(((d % 11) - 5).toInt, (((d + 3) % 11) - 5).toInt)
      val wCb = Array((1 + d % 2).toInt, (1 + (d + 1) % 2).toInt)
      val oCb = Array(((d % 7) - 3).toInt, (((d + 2) % 7) - 3).toInt)
      val wCr = Array((1 + (d + 1) % 2).toInt, (1 + d % 2).toInt)
      val oCr = Array((((d + 5) % 7) - 3).toInt, (((d + 1) % 7) - 3).toInt)
      val frames = H264Codec.decodeSequence(
        H264Codec.encodeInter(Multimodal.h264WeightedPlan(d)))
      assert(frames.length == 3)
      def srcMb(mb: Int) = mb match { case 2 => 3; case 3 => 1; case m => m }
      def refOf(mb: Int) = ((mb + d) % 2).toInt
      def checkFrame(fi: Int, fy: (Int, Int) => Int, fcb: Int => Int,
                     fcr: Int => Int): Unit = {
        val fr = frames(fi)
        for (y <- 0 until 32; x <- 0 until 32) {
          val mb = (y / 16) * 2 + x / 16
          assert((fr.y(y * 32 + x) & 0xff) == fy(mb, fi), s"d=$d f$fi Y($x,$y)")
        }
        for (y <- 0 until 16; x <- 0 until 16) {
          val mb = (y / 8) * 2 + x / 8
          assert((fr.u(y * 16 + x) & 0xff) == fcb(mb), s"d=$d f$fi U($x,$y)")
          assert((fr.v(y * 16 + x) & 0xff) == fcr(mb), s"d=$d f$fi V($x,$y)")
        }
      }
      checkFrame(0, (mb, _) => t1(mb), t1cb, t1cr)
      checkFrame(1, (mb, _) => t2(mb), t2cb, t2cr)
      def lw(mb: Int): Int = {
        val r = refOf(mb); val s = srcMb(mb)
        wp(if (r == 0) t2(s) else t1(s), wL(r), oL(r), 2)
      }
      def cwb(mb: Int): Int = {
        val r = refOf(mb); val s = srcMb(mb)
        wp(if (r == 0) t2cb(s) else t1cb(s), wCb(r), oCb(r), 1)
      }
      def cwr(mb: Int): Int = {
        val r = refOf(mb); val s = srcMb(mb)
        wp(if (r == 0) t2cr(s) else t1cr(s), wCr(r), oCr(r), 1)
      }
      checkFrame(2, (mb, _) => lw(mb), cwb, cwr)
    }
  }

  test("CABAC ref_idx: both entropy backends decode identically") {
    for (d <- Seq(1L, 4L, 9L)) {
      val plan = Multimodal.h264WeightedPlan(d)
      val a = H264Codec.decodeSequence(H264Codec.encodeInter(plan))
      val b = H264Codec.decodeSequence(H264Codec.encodeInter(plan, cabac = true))
      for (fi <- 0 to 2)
        assert(a(fi).y.toSeq == b(fi).y.toSeq && a(fi).u.toSeq == b(fi).u.toSeq &&
          a(fi).v.toSeq == b(fi).v.toSeq, s"d=$d frame $fi")
    }
    assertThrows[IllegalArgumentException](
      H264Codec.encodeInter(Multimodal.h264WeightedPlan(3L).copy(wspec = null)))
  }

  test("weights are value-visible: different weights change the frame") {
    val a = H264Codec.decodeSequence(
      H264Codec.encodeInter(Multimodal.h264WeightedPlan(0L)))(2)
    val plan = Multimodal.h264WeightedPlan(0L)
    val b = H264Codec.decodeSequence(H264Codec.encodeInter(plan.copy(
      wspec = plan.wspec.copy(luma = plan.wspec.luma.map {
        case (w, o) => (w + 1, o) }))))(2)
    assert(a.y.toSeq != b.y.toSeq)
  }
}
