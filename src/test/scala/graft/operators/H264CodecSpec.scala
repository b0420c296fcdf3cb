package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** H.264 entry rung: NAL transport (start codes, emulation prevention),
  * exp-Golomb, SPS/PPS walks, IDR slice headers, I_PCM reconstruction,
  * and the malformed-input surface.
  */
class H264CodecSpec extends AnyFunSuite {

  private def stream(d: Long, w: Int, h: Int): Array[Byte] = {
    val mbW = w / 16
    def zeroMb(m: Int): Boolean = (m + d) % 5 == 0
    H264Codec.encode(w, h,
      (x, yy) => {
        val m = (yy / 16) * mbW + x / 16
        if (zeroMb(m)) 0 else ((31 * d + 13 * m + x % 16 + 17 * (yy % 16)) % 256).toInt
      },
      (x2, y2) => {
        val m = (y2 / 8) * mbW + x2 / 8
        if (zeroMb(m)) 0 else ((91 * d + 7 * m + 3 * (x2 % 8) + 5 * (y2 % 8)) % 256).toInt
      },
      (x2, y2) => {
        val m = (y2 / 8) * mbW + x2 / 8
        if (zeroMb(m)) 0 else ((53 * d + 11 * m + 7 * (x2 % 8) + 13 * (y2 % 8)) % 256).toInt
      })
  }

  test("emulation prevention: escape and unescape are exact inverses, EP bytes live") {
    val rbsp = Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 9, 0, 0, 0)
    val esc = H264Codec.escapeRbsp(rbsp)
    assert(esc.length > rbsp.length, "EP bytes must be inserted")
    // no unescaped 00 00 0x (x <= 3) survives in the escaped form
    for (i <- 0 until esc.length - 2)
      assert(!(esc(i) == 0 && esc(i + 1) == 0 && (esc(i + 2) & 0xff) <= 3
        && (esc(i + 2) & 0xff) != 3),
        s"raw 00 00 0x at $i")
    assert(H264Codec.unescapeRbsp(esc).sameElements(rbsp))
  }

  test("I_PCM round trip: every pixel exact, zero MBs force EP bytes through the slice") {
    for (d <- 0L until 10L) {
      val w = 48; val h = 32
      val b = stream(d, w, h)
      // the all-zero PCM macroblocks must have produced EP bytes
      assert((0 until b.length - 2).exists(i =>
        b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 3), "expected EP bytes in the stream")
      val f = H264Codec.decode(b)
      assert(f.width == w && f.height == h)
      val mbW = w / 16
      def zeroMb(m: Int) = (m + d) % 5 == 0
      for (yy <- 0 until h; x <- 0 until w) {
        val m = (yy / 16) * mbW + x / 16
        val want = if (zeroMb(m)) 0
          else ((31 * d + 13 * m + x % 16 + 17 * (yy % 16)) % 256).toInt
        assert((f.y(yy * w + x) & 0xff) == want, s"d=$d y($x,$yy)")
      }
      for (y2 <- 0 until h / 2; x2 <- 0 until w / 2) {
        val m = (y2 / 8) * mbW + x2 / 8
        val wu = if (zeroMb(m)) 0
          else ((91 * d + 7 * m + 3 * (x2 % 8) + 5 * (y2 % 8)) % 256).toInt
        val wv = if (zeroMb(m)) 0
          else ((53 * d + 11 * m + 7 * (x2 % 8) + 13 * (y2 % 8)) % 256).toInt
        assert((f.u(y2 * (w / 2) + x2) & 0xff) == wu, s"d=$d u($x2,$y2)")
        assert((f.v(y2 * (w / 2) + x2) & 0xff) == wv, s"d=$d v($x2,$y2)")
      }
    }
  }

  test("NAL split: three units with the right types; SPS/PPS parse standalone") {
    val b = stream(3L, 32, 16)
    val nals = H264Codec.splitNals(b)
    assert(nals.map(_._2) == Seq(7, 8, 5))
    val sps = H264Codec.parseSps(nals(0)._3)
    assert(sps.profile == 66 && sps.widthMbs == 2 && sps.heightMbs == 1)
    val pps = H264Codec.parsePps(nals(1)._3)
    assert(!pps.entropyCabac && pps.picInitQp == 26)
  }

  test("ImageCodec routes Annex B streams to the H.264 decoder") {
    val b = stream(1L, 16, 16)
    assert(ImageCodec.sniff(b).contains("h264"))
    val img = ImageCodec.decode(b)
    assert(img.format == "h264" && img.channels == 3
      && img.pixels.length == 16 * 16 * 3 / 2)
  }

  test("malformed: every corruption fails loudly") {
    val good = stream(2L, 32, 32)
    // forbidden_zero_bit on the first NAL header (after 00 00 00 01)
    val fb = good.clone(); fb(4) = (fb(4) | 0x80).toByte
    intercept[IllegalArgumentException](H264Codec.decode(fb))
    // truncated slice
    intercept[IllegalArgumentException](
      H264Codec.decode(java.util.Arrays.copyOf(good, good.length - 9)))
    // garbage before the first start code
    intercept[IllegalArgumentException](H264Codec.decode(0x55.toByte +: good))
    // a PPS with entropy_coding_mode=1 now parses (CABAC is a real
    // backend); the flag must round-trip
    val nals = H264Codec.splitNals(good)
    val pps = nals(1)._3.clone()
    // pps RBSP starts: ue(0)=1, ue(0)=1, then entropy flag at bit 2
    pps(0) = (pps(0) | 0x20).toByte
    assert(H264Codec.parsePps(pps).entropyCabac)
    assert(!H264Codec.parsePps(nals(1)._3).entropyCabac)
  }
}
