package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** AAC-LC entry rung: ADTS framing, section/scalefactor/spectral grammar
  * (all 11 codebooks incl. the escape book), the IMDCT overlap-add, and
  * the malformed-input surface.
  */
class AacCodecSpec extends AnyFunSuite {

  private def frameOf(d: Long, f: Int): AacCodec.AacFrame = {
    val pos = ((37 * d + 911 * f) % 1024).toInt
    val cb = (1 + (d + f) % 11).toInt
    val mag =
      if (cb == 11) (16 + d % 40).toInt
      else (1 + (d + f) % AacCodec.cbLav(cb)).toInt
    val v = if ((d + f) % 2 == 1) -mag else mag
    AacCodec.AacFrame(
      globalGain = (20 + (29 * d + 7 * f) % 200).toInt,
      lines = Seq((pos, v, cb)),
      sfDelta = ((d + 3 * f) % 41 - 20).toInt)
  }

  private def stream(d: Long): Array[Byte] = {
    val nf = 1 + (d % 2).toInt
    AacCodec.encode((0 until nf).map(f => frameOf(d, f)))
  }

  /** Closed-form replay by linearity: one line per frame → requant →
    * IMDCT landing in this frame's window head and the next frame's
    * overlap tail. Exactly the SQL oracle's algebra.
    */
  private def expected(d: Long): Array[Long] = {
    val nf = 1 + (d % 2).toInt
    val pcm = new Array[Long](nf * 1024)
    for (f <- 0 until nf) {
      val fr = frameOf(d, f)
      val (pos, v, _) = fr.lines.head
      val sf = fr.globalGain + fr.sfDelta
      val mag = math.abs(v).toLong * (math.abs(v) + 2) * (1 + (5L * sf) % 13)
      val xr = if (v < 0) -mag else mag
      for (p <- 0 until 2048) {
        val t = if (p < 1024) f * 1024 + p else (f + 1) * 1024 + (p - 1024)
        if (t < nf * 1024)
          pcm(t) += xr * (((13 * p + 7 * pos + 5) % 29) - 14) * (1 + ((3 * p) % 17))
      }
    }
    pcm
  }

  test("AAC-LC: decoded PCM matches the closed-form linearity replay, all 11 codebooks") {
    for (d <- 0L until 24L) {
      val out = AacCodec.decode(stream(d))
      val nf = 1 + (d % 2).toInt
      assert(out.nFrames == nf && out.pcm.length == nf * 1024)
      val want = expected(d)
      assert(out.pcm.sameElements(want),
        s"d=$d first diff at ${out.pcm.zip(want).indexWhere(t => t._1 != t._2)}")
    }
  }

  test("escape sequences: codebook 11 values above 16 round-trip") {
    for (mag <- Seq(16, 17, 31, 32, 63)) {
      val fr = AacCodec.AacFrame(100, Seq((40, -mag, 11)), 0)
      val out = AacCodec.decode(AacCodec.encode(Seq(fr)))
      val sfv = 100
      val want = -mag.toLong * (mag + 2) * (1 + (5L * sfv) % 13)
      // sample 0 carries xr·cos(0,40)·win(0)
      val c0 = ((13 * 0 + 7 * 40 + 5) % 29) - 14
      assert(out.pcm(0) == want * c0 * 1)
    }
  }

  test("ADTS framing: frame_length is validated; two frames overlap-add across the boundary") {
    val b = stream(1L) // two frames
    val out = AacCodec.decode(b)
    assert(out.nFrames == 2)
    // corrupt frame_length of the first header: bits 30..42
    val bad = b.clone()
    bad(4) = (bad(4) ^ 0x10).toByte
    intercept[IllegalArgumentException](AacCodec.decode(bad))
  }

  test("EIGHT_SHORT sequences: grouped sections, interleave, 448+128w placement") {
    for (d <- 0 until 12) {
      val nf = 1 + d % 2
      def frameOf(f: Int): AacCodec.AacFrame = {
        val pos = (37 * d + 911 * f) % 1024
        val cb = 1 + (d + f) % 11
        val mag = if (cb == 11) 16 + d % 40 else 1 + (d + f) % AacCodec.cbLav(cb)
        val v = if ((d + f) % 2 == 1) -mag else mag
        AacCodec.AacFrame(20 + (29 * d + 7 * f) % 200, Seq((pos, v, cb)),
          (d + 3 * f) % 41 - 20, shortSeq = true, grouping = (d + 5 * f) % 128)
      }
      val out = AacCodec.decode(AacCodec.encode((0 until nf).map(frameOf)))
      assert(out.nFrames == nf && out.pcm.length == 1024 * nf)
      val exp = new Array[Long](1024 * nf)
      for (f <- 0 until nf) {
        val pos = (37 * d + 911 * f) % 1024
        val win = pos / 128; val k = pos % 128
        val cb = 1 + (d + f) % 11
        val mag = if (cb == 11) 16 + d % 40 else 1 + (d + f) % AacCodec.cbLav(cb)
        val sfv = 20 + (29 * d + 7 * f) % 200 + (d + 3 * f) % 41 - 20
        val xr = (if ((d + f) % 2 == 1) -1L else 1L) *
          AacCodec.aacPow43(mag) * AacCodec.aacGain(sfv)
        for (p <- 0 until 256) {
          val t = f * 1024 + AacCodec.ShortOffset + 128 * win + p
          if (t < exp.length)
            exp(t) += xr * AacCodec.aacCosS(p, k) * AacCodec.aacWinS(p)
        }
      }
      assert(out.pcm.sameElements(exp), s"d=$d")
    }
  }

  test("START/STOP transitions: the four-sequence walk matches the flat replay") {
    for (d <- 0 until 10) {
      def frameOf(f: Int): AacCodec.AacFrame = {
        val pos = (37 * d + 911 * f) % 1024
        val cb = 1 + (d + f) % 11
        val mag = if (cb == 11) 16 + d % 40 else 1 + (d + f) % AacCodec.cbLav(cb)
        val v = if ((d + f) % 2 == 1) -mag else mag
        AacCodec.AacFrame(20 + (29 * d + 7 * f) % 200, Seq((pos, v, cb)),
          (d + 3 * f) % 41 - 20, shortSeq = f == 2,
          grouping = if (f == 2) (d + 5 * f) % 128 else 0, windowSeq = f)
      }
      val out = AacCodec.decode(AacCodec.encode((0 until 4).map(frameOf)))
      assert(out.nFrames == 4 && out.pcm.length == 4096)
      val exp = new Array[Long](4096)
      for (f <- 0 until 4) {
        val pos = (37 * d + 911 * f) % 1024
        val cb = 1 + (d + f) % 11
        val mag = if (cb == 11) 16 + d % 40 else 1 + (d + f) % AacCodec.cbLav(cb)
        val sfv = 20 + (29 * d + 7 * f) % 200 + (d + 3 * f) % 41 - 20
        val xr = (if ((d + f) % 2 == 1) -1L else 1L) *
          AacCodec.aacPow43(mag) * AacCodec.aacGain(sfv)
        if (f == 2) {
          val win = pos / 128; val k = pos % 128
          for (p <- 0 until 256) {
            val t = f * 1024 + AacCodec.ShortOffset + 128 * win + p
            if (t < 4096) exp(t) += xr * AacCodec.aacCosS(p, k) * AacCodec.aacWinS(p)
          }
        } else for (p <- 0 until 2048) {
          val t = f * 1024 + p
          if (t < 4096) exp(t) += xr * AacCodec.aacCos(p, pos) * AacCodec.aacWinSeq(f, p)
        }
      }
      assert(out.pcm.sameElements(exp), s"d=$d")
    }
    // the transition windows' structural pins: zero regions and halves
    for (p <- 1600 until 2048) assert(AacCodec.aacWinSeq(1, p) == 0)
    for (p <- 0 until 448) assert(AacCodec.aacWinSeq(3, p) == 0)
    for (p <- 0 until 1024) assert(AacCodec.aacWinSeq(1, p) == AacCodec.aacWinSeq(0, p))
    for (p <- 1024 until 2048) assert(AacCodec.aacWinSeq(3, p) == AacCodec.aacWinSeq(0, p))
  }

  test("window grouping: the 7 MSB-first merge bits form the spec groups") {
    assert(AacCodec.windowGroups(0) == Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4), Seq(5), Seq(6), Seq(7)))
    assert(AacCodec.windowGroups(127) == Seq(0 to 7))
    assert(AacCodec.windowGroups(0x44) == Seq(Seq(0, 1), Seq(2), Seq(3), Seq(4, 5), Seq(6), Seq(7)))
  }

  test("malformed: every corruption fails loudly") {
    val good = stream(2L)
    // lost sync
    val ns = good.clone(); ns(0) = 0x12
    intercept[IllegalArgumentException](AacCodec.decode(ns))
    // CRC-protected header (protection_absent = 0)
    val crc = good.clone(); crc(1) = (crc(1) & ~0x01).toByte
    intercept[IllegalArgumentException](AacCodec.decode(crc))
    // stereo channel configuration
    val st = good.clone(); st(2) = (st(2) | 0x01).toByte // chan cfg high bit? cfg bits 23..25
    intercept[IllegalArgumentException](AacCodec.decode(st))
    // truncated
    intercept[IllegalArgumentException](
      AacCodec.decode(java.util.Arrays.copyOf(good, good.length - 3)))
    // empty
    intercept[IllegalArgumentException](AacCodec.decode(Array.emptyByteArray))
  }
}
