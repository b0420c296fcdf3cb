package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** H.264 adaptive reference marking (7.4.3.3 / 8.2.5 MMCO 1): a
  * reference all-P_Skip frame unmarks the P frame, so the following
  * probe slice's two references are [skip-copy, IDR] — the sliding
  * window alone would have evicted the IDR. Frame 3 must be a pixel
  * copy of frame 2, and frame 4 must reproduce the multi-reference
  * constant table (reference 0 = the copy's P content, reference 1 =
  * the IDR); without the marking, every reference-1 partition reads
  * the P constants instead.
  */
class H264MmcoSpec extends AnyFunSuite {

  test("MMCO keeps the IDR addressable through the probe slice") {
    for (d <- 0L until 16L) {
      val colv = d % 2 == 0
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264MmcoPlan(d, colv), cabac = d % 4 == 3))
      assert(frames.length == 4)
      // frame 3 (the marking slice) is a pixel copy of frame 2
      assert(frames(2).y.toSeq == frames(1).y.toSeq, s"d=$d")
      assert(frames(2).u.toSeq == frames(1).u.toSeq && frames(2).v.toSeq == frames(1).v.toSeq)
      // frame 4 equals the q_h264_pmref probe decoded against [P, IDR]
      val pm = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264PMRefPlan(d, colv), cabac = d % 4 == 3))
      assert(frames(3).y.toSeq == pm(2).y.toSeq, s"d=$d probe")
      assert(frames(3).u.toSeq == pm(2).u.toSeq && frames(3).v.toSeq == pm(2).v.toSeq)
    }
  }

  test("the marking is what keeps reference 1 on the IDR") {
    // without MMCO the sliding window evicts the IDR: the same probe
    // would read the skip-copy's P constants on reference 1 — assert
    // the MMCO stream's probe really differs from a no-MMCO chain where
    // the P frame survives in both slots
    val d = 1L
    val mm = H264Codec.decodeSequence(H264Codec.encodeInter(
      Multimodal.h264MmcoPlan(d, colv = false)))
    // pmref probe against [P, IDR]: its ref-1 partitions read A; under a
    // sliding-window-only chain they would read the copy (B) — so the
    // probe must NOT equal a B-everywhere rendering (frame 2 content)
    assert(mm(3).y.toSeq != mm(2).y.toSeq)
  }
}
