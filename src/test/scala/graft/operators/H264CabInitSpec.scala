package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** cabac_init_idc 1/2: the P slice selects one of the pinned context
  * initialization tables; encoder and decoder must agree on it or the
  * arithmetic decode desyncs from the first bin. Initialization must be
  * pixel-transparent (same output as CAVLC and as idc 0), while the
  * coded BITS must actually differ across tables (the init is live).
  */
class H264CabInitSpec extends AnyFunSuite {

  test("init tables are pixel-transparent and bit-effective") {
    for (d <- 0L until 12L) {
      val colv = d % 2 == 0
      val base = Multimodal.h264BSubPlan(d, colv)
      val cavlc = H264Codec.decodeSequence(H264Codec.encodeInter(base))
      for (idc <- 0 to 2) {
        val stream = H264Codec.encodeInter(base.copy(cabacIdc = idc), cabac = true)
        val frames = H264Codec.decodeSequence(stream)
        for (fi <- 0 to 2)
          assert(frames(fi).y.toSeq == cavlc(fi).y.toSeq &&
            frames(fi).u.toSeq == cavlc(fi).u.toSeq &&
            frames(fi).v.toSeq == cavlc(fi).v.toSeq, s"d=$d idc=$idc frame $fi")
      }
      val s0 = H264Codec.encodeInter(base.copy(cabacIdc = 0), cabac = true)
      val s1 = H264Codec.encodeInter(base.copy(cabacIdc = 1), cabac = true)
      val s2 = H264Codec.encodeInter(base.copy(cabacIdc = 2), cabac = true)
      assert(s0.toSeq != s1.toSeq && s1.toSeq != s2.toSeq, s"d=$d")
    }
  }
}
