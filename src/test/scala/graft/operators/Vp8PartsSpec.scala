package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VP8 4/8 token partitions (RFC 6386 9.5): the size table carries a
  * 3-byte little-endian entry per partition except the last, MB rows
  * interleave over the partitions, and the pixel output must be
  * IDENTICAL to a single-partition coding of the same plan.
  */
class Vp8PartsSpec extends AnyFunSuite {

  test("4/8 token partitions decode pixel-exact and partition-count-neutral") {
    for (d <- 0L until 8L; nc <- 0L until 2L) {
      val (w, h, webp) = Multimodal.vp8PartsFrame(d, nc)
      val fr = Vp8Codec.decodeWebp(webp)
      assert(fr.width == w && fr.height == h)
      def yT(m: Int) = ((31 * d + 13 * m) % 256).toInt
      def uT(m: Int) = ((91 * d + 7 * m) % 256).toInt
      def vT(m: Int) = ((53 * d + 11 * m) % 256).toInt
      val mbW = w / 16
      for (y <- 0 until h; x <- 0 until w)
        assert((fr.y(y * w + x) & 0xff) == yT((y / 16) * mbW + x / 16),
          s"y ($x,$y) d=$d nc=$nc")
      for (y <- 0 until h / 2; x <- 0 until w / 2) {
        assert((fr.u(y * (w / 2) + x) & 0xff) == uT((y / 8) * mbW + x / 8), s"u d=$d")
        assert((fr.v(y * (w / 2) + x) & 0xff) == vT((y / 8) * mbW + x / 8), s"v d=$d")
      }
      // partition-count neutrality: the same plan over ONE partition
      // reconstructs the identical frame from a different byte layout
      val one = Vp8Codec.decodeFrame(Vp8Codec.encodeFrame(Vp8Codec.Plan(
        w, h, qi = 0, uvDcDelta = 0, yMode = 0, tokenPartitions = 1,
        skipAll = false,
        yTarget = m => yT(m), uTarget = m => uT(m), vTarget = m => vT(m))))
      assert(one.y.toSeq == fr.y.toSeq && one.u.toSeq == fr.u.toSeq
        && one.v.toSeq == fr.v.toSeq, s"d=$d nc=$nc")
    }
  }

  test("a truncated partition size table is rejected loudly") {
    val (_, _, webp) = Multimodal.vp8PartsFrame(0L, 0L)
    // strip the RIFF wrap, then truncate inside the size table: the
    // frame tag's part0 length keeps the header intact while the cut
    // lands in the 9-byte 4-partition size table
    val size = (webp(16) & 0xff) | ((webp(17) & 0xff) << 8) |
      ((webp(18) & 0xff) << 16) | ((webp(19) & 0xff) << 24)
    val frame = java.util.Arrays.copyOfRange(webp, 20, 20 + size)
    val part0Len = ((frame(0) & 0xff) | ((frame(1) & 0xff) << 8) |
      ((frame(2) & 0xff) << 16)) >> 5
    val cut = java.util.Arrays.copyOf(frame, 10 + part0Len + 4)
    val ex = intercept[IllegalArgumentException](Vp8Codec.decodeFrame(cut))
    assert(ex.getMessage.contains("partition"))
  }
}
