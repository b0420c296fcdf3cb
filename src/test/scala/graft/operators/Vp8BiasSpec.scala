package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VP8 reference sign bias (RFC 6386 9.7), graded against hand-derived
  * per-macroblock constants: with sign_bias set on golden (or altref),
  * a near-MV survey candidate whose reference sits on the other side
  * of the bias boundary contributes its NEGATED vector — each flip in
  * the fixture lands the NEAREST fetch one macroblock on the OTHER
  * side of the coded neighbor's vector.
  */
class Vp8BiasSpec extends AnyFunSuite {

  test("bias-flipped candidates land the hand-derived fetches") {
    for (d <- 0L until 16L) {
      def yA(m: Int) = ((31 * d + 13 * m) % 256).toInt
      def uA(m: Int) = ((91 * d + 7 * m) % 256).toInt
      def vA(m: Int) = ((53 * d + 11 * m) % 256).toInt
      def yB(m: Int) = ((47 * d + 17 * m) % 256).toInt
      def uB(m: Int) = ((23 * d + 5 * m) % 256).toInt
      def vB(m: Int) = ((67 * d + 3 * m) % 256).toInt
      val frames = Vp8Codec.decodeIvf(
        Vp8Codec.encodeIvf(80, 16, Multimodal.vp8BiasFrames(d)))
      assert(frames.length == 3)
      // frame 3 by hand: m0 NEW +1MB on A -> A(1); m1 last NEAREST with
      // the golden/alt neighbor's +128 flipped to -128 -> B(0); m2 the
      // inverse flip -> A(3); m3 NEW -> A(4); m4 flip again -> B(3)
      val expY = Array(yA(1), yB(0), yA(3), yA(4), yB(3))
      val expU = Array(uA(1), uB(0), uA(3), uA(4), uB(3))
      val expV = Array(vA(1), vB(0), vA(3), vA(4), vB(3))
      val f = frames(2)
      for (m <- 0 until 5; yy <- 0 until 16; xx <- 0 until 16)
        assert((f.y(yy * 80 + m * 16 + xx) & 0xff) == expY(m), s"d=$d y mb $m")
      for (m <- 0 until 5; yy <- 0 until 8; xx <- 0 until 8) {
        assert((f.u(yy * 40 + m * 8 + xx) & 0xff) == expU(m), s"d=$d u mb $m")
        assert((f.v(yy * 40 + m * 8 + xx) & 0xff) == expV(m), s"d=$d v mb $m")
      }
    }
  }

  test("the bias is value-visible: clearing it moves the fetches") {
    val d = 2L
    val frames = Multimodal.vp8BiasFrames(d)
    // same geometry with both bias bits clear
    def yA(m: Int) = ((31 * d + 13 * m) % 256).toInt
    def uA(m: Int) = ((91 * d + 7 * m) % 256).toInt
    def vA(m: Int) = ((53 * d + 11 * m) % 256).toInt
    def yB(m: Int) = ((47 * d + 17 * m) % 256).toInt
    def uB(m: Int) = ((23 * d + 5 * m) % 256).toInt
    def vB(m: Int) = ((67 * d + 3 * m) % 256).toInt
    val (kf, g1) = Vp8Codec.encodeKeyFrame(Vp8Codec.Plan(80, 16, 0, 0,
      yMode = 0, tokenPartitions = 1, skipAll = false, yA, uA, vA))
    val p2 = Vp8Codec.InterPlan(80, 16, 0, 0, tokenPartitions = 1,
      refreshLast = true, refreshGolden = false,
      mb = m => Vp8Codec.InterMb(0, 0, 0, 0, skip = false, yB(m), uB(m), vB(m)))
    val (f2, g2) = Vp8Codec.encodeInterFrame(p2, g1, g1)
    // the same geometry WITHOUT the bias cannot even encode: m4's
    // un-flipped NEAREST candidate (+1 MB) leaves the frame
    assertThrows[IllegalArgumentException] {
      Vp8Codec.encodeInterFrame(Vp8Codec.InterPlan(80, 16, 0, 0,
        tokenPartitions = 1, refreshLast = false, refreshGolden = false,
        mb = {
          case 0 => Vp8Codec.InterMb(1, 3, 16, 0, skip = true, 0, 0, 0)
          case 1 => Vp8Codec.InterMb(0, 1, 0, 0, skip = true, 0, 0, 0)
          case 2 => Vp8Codec.InterMb(1, 1, 0, 0, skip = true, 0, 0, 0)
          case 3 => Vp8Codec.InterMb(1, 3, 16, 0, skip = true, 0, 0, 0)
          case _ => Vp8Codec.InterMb(0, 1, 0, 0, skip = true, 0, 0, 0)
        }), g2, g1)
    }
    // and the encodable prefix (m4 pinned to ZEROMV) decodes m1/m2 to
    // the un-flipped fetches, differing from the biased stream
    val p3 = Vp8Codec.InterPlan(80, 16, 0, 0, tokenPartitions = 1,
      refreshLast = false, refreshGolden = false,
      mb = {
        case 0 => Vp8Codec.InterMb(1, 3, 16, 0, skip = true, 0, 0, 0)
        case 1 => Vp8Codec.InterMb(0, 1, 0, 0, skip = true, 0, 0, 0)
        case 2 => Vp8Codec.InterMb(1, 1, 0, 0, skip = true, 0, 0, 0)
        case 3 => Vp8Codec.InterMb(1, 3, 16, 0, skip = true, 0, 0, 0)
        case _ => Vp8Codec.InterMb(0, 0, 0, 0, skip = true, 0, 0, 0)
      })
    val (f3, _) = Vp8Codec.encodeInterFrame(p3, g2, g1)
    val a = Vp8Codec.decodeIvf(Vp8Codec.encodeIvf(80, 16, frames))
    val b = Vp8Codec.decodeIvf(Vp8Codec.encodeIvf(80, 16, Seq(kf, f2, f3)))
    assert(a(2).y.toSeq != b(2).y.toSeq)
  }
}
