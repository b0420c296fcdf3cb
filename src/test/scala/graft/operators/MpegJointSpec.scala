package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer I/II joint (intensity) stereo — the bound mode: shared
  * allocation and ONE sample stream at/above bound = 4 + 4·ext with
  * per-channel scalefactors — graded against an independent replay of
  * the dequant + polyphase algebra.
  */
class MpegJointSpec extends AnyFunSuite {

  private def replay(d: Long): Array[Long] = {
    val layer = 1 + (d % 2).toInt
    val ext = ((d / 2) % 4).toInt
    val bound = 4 + 4 * ext
    val ng = if (layer == 1) 12 else 36
    val pcm = new Array[Long](ng * 32 * 2)
    // per (channel, subband) dequantized sample value at granule g
    def sv(g: Int, ch: Int, sub: Int): (Int, Long) = // (subband, value)
      if (layer == 1) {
        val kB = ((d + 7 * ch) % bound).toInt
        val kA = bound + (d % (32 - bound)).toInt
        val aB = (2 + (d + ch) % 8).toInt
        val aA = (2 + (d + 5) % 8).toInt
        if (sub == 0) {
          val n = (1 << (aB + 1)) - 1
          val raw = ((5 * d + 7 * g + 3 + 17 * ch) % n).toInt
          (kB, (2L * raw + 1 - n) * (1 + (3 * ((d + 13 * ch) % 64)) % 13))
        } else {
          val n = (1 << (aA + 1)) - 1
          val raw = ((5 * d + 11 * g + 1) % n).toInt // SHARED stream
          (kA, (2L * raw + 1 - n) * (1 + (3 * ((d + 19 * ch) % 64)) % 13))
        }
      } else {
        val cls = Array(3, 5, 6, 7)
        val kB = ((d + 7 * ch) % bound).toInt
        val kA = bound + (d % (23 - bound)).toInt
        val nB = MpegAudio.l2Class(cls(((d + ch) % 4).toInt))._1
        val nA = MpegAudio.l2Class(cls(((d + 2) % 4).toInt))._1
        if (sub == 0) {
          val raw = ((5 * d + 7 * g + 3 + 17 * ch) % nB).toInt
          (kB, (2L * raw + 1 - nB) * (1 + (3 * ((3 * d + 29 * ch) % 64)) % 13))
        } else {
          val raw = ((5 * d + 11 * g + 1) % nA).toInt
          (kA, (2L * raw + 1 - nA) * (1 + (3 * ((3 * d + 11 + 23 * ch) % 64)) % 13))
        }
      }
    for (g <- 0 until ng; ch <- 0 to 1; sub <- 0 to 1; m <- 0 to 15;
         if g + m < ng; i <- 0 until 32) {
      val (k0, v) = sv(g, ch, sub)
      pcm(((g + m) * 32 + i) * 2 + ch) +=
        v * MpegAudio.nTab((m % 2) * 32 + i, k0) * MpegAudio.dTab(m * 32 + i)
    }
    pcm
  }

  test("joint bound mode matches the independent replay, both layers, all bounds") {
    for (d <- 0L until 16L) {
      val out = MpegAudio.decode(Multimodal.mpegJointStream(d))
      val layer = 1 + (d % 2).toInt
      assert(out.layer == layer && out.channels == 2 && out.nFrames == 1)
      assert(out.pcm.length == (if (layer == 1) 768 else 2304))
      assert(out.pcm.toSeq == replay(d).toSeq, s"d=$d layer=$layer")
    }
  }

  test("the shared stream is value-visible: plain stereo differs") {
    // same content coded as INDEPENDENT stereo (each channel carries its
    // own above-bound samples) must differ whenever the two channels'
    // raw streams differ — here ch-1's below-bound stream leaks into the
    // above-bound subband
    val d = 4L
    val joint = MpegAudio.decode(Multimodal.mpegJointStream(d)).pcm
    val bound = 4 + 4 * ((d / 2) % 4).toInt
    val kA = bound + (d % (32 - bound)).toInt
    val aA = (2 + (d + 5) % 8).toInt
    val n = (1 << (aA + 1)) - 1
    def kB(ch: Int) = ((d + 7 * ch) % bound).toInt
    def aB(ch: Int) = (2 + (d + ch) % 8).toInt
    val indep = MpegAudio.decode(MpegAudio.encodeL1Stereo(
      alloc = (ch, sb) => if (sb == kB(ch)) aB(ch) else if (sb == kA) aA else 0,
      sf = (ch, sb) =>
        if (sb == kA) ((d + 19 * ch) % 64).toInt else ((d + 13 * ch) % 64).toInt,
      raw = (g, ch, sb) =>
        if (sb == kA) ((5 * d + 11 * g + 1 + 3 * ch) % n).toInt
        else ((5 * d + 7 * g + 3 + 17 * ch) % ((1 << (aB(ch) + 1)) - 1)).toInt)).pcm
    assert(joint.toSeq != indep.toSeq)
  }
}
