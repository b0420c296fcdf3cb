package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** AAC stereo channel_pair_element — common_window, the ms_mask_present
  * family, MS reconstruction — graded against an independent replay:
  * the per-channel effective spectra are derived here from the mixing
  * rules, pushed through the IMDCT identity, and interleaved; plus the
  * loud-reject surface.
  */
class AacCpeSpec extends AnyFunSuite {

  private def xrOf(d: Long, src: Int): Long = {
    val cb = (1 + (d + 3 * src) % 11).toInt
    val mag = if (cb == 11) (16 + d % 40).toInt
    else (1 + (d + src) % AacCodec.cbLav(cb)).toInt
    val sf = (20 + ((29 + 2 * src) * d) % 200).toInt + (((d + 7 * src) % 41) - 20).toInt
    val x = AacCodec.aacPow43(mag) * AacCodec.aacGain(sf)
    if ((d + src) % 2 == 1) -x else x
  }

  test("CPE mask family matches the independent mixing replay") {
    for (d <- 0L until 16L) {
      val r = (d % 4).toInt
      val posL = ((37 * d + 11) % 1024).toInt
      val posR = if (r == 0) ((53 * d + 477) % 1024).toInt else posL
      val xl = xrOf(d, 0)
      val xr = xrOf(d, 1)
      // effective per-channel line sets after the MS rules
      val mixed = r == 1 || r == 2
      val chLines: Int => Seq[(Int, Long)] = ch =>
        if (mixed) Seq((posL, if (ch == 0) xl + xr else xl - xr))
        else if (ch == 0) Seq((posL, xl))
        else Seq((posR, xr))
      val out = AacCodec.decode(Multimodal.aacCpeStream(d))
      assert(out.nFrames == 1 && out.channels == 2 && out.pcm.length == 2048)
      for (ch <- 0 to 1) {
        val want = Array.tabulate(1024) { p =>
          chLines(ch).map { case (k, x) =>
            x * AacCodec.aacCos(p, k) * AacCodec.aacWin(p)
          }.sum
        }
        for (p <- 0 until 1024)
          assert(out.pcm(2 * p + ch) == want(p), s"d=$d ch=$ch p=$p (mode $r)")
      }
    }
  }

  test("mask granularity is value-visible: hit vs miss differ") {
    // d=2 (mask hits the band) vs the same stream with the mask missing
    val hit = AacCodec.decode(Multimodal.aacCpeStream(2L)).pcm
    val d = 2L
    val posL = ((37 * d + 11) % 1024).toInt
    def ch(src: Int): AacCodec.AacFrame = {
      val cb = (1 + (d + 3 * src) % 11).toInt
      val mag = (1 + (d + src) % AacCodec.cbLav(cb)).toInt
      AacCodec.AacFrame(
        globalGain = (20 + ((29 + 2 * src) * d) % 200).toInt,
        lines = Seq((posL, if ((d + src) % 2 == 1) -mag else mag, cb)),
        sfDelta = (((d + 7 * src) % 41) - 20).toInt)
    }
    val miss = AacCodec.decode(AacCodec.encodeCpe(Seq(AacCodec.AacCpe(
      ch(0), ch(1), msMaskPresent = 1,
      msUsed = (_, b) => b != posL / 32)))).pcm
    assert(hit.toSeq != miss.toSeq)
  }

  test("intensity stereo: phase, is_pos gain, and the MS interplay") {
    for (d <- 0L until 16L) {
      val r = (d % 4).toInt
      val pos = ((37 * d + 11) % 1024).toInt
      val mag = (1 + d % 4).toInt
      val sf = (20 + (29 * d) % 200).toInt + ((d % 41) - 20).toInt
      val xl = AacCodec.aacPow43(mag) * AacCodec.aacGain(sf) *
        (if (d % 2 == 1) -1 else 1)
      val isPos = if (r == 3) -(1 + (d % 20)).toInt else ((d % 25) - 12).toInt
      // book phase, inverted under the ms mask (case 2)
      val ph = (if (r == 1) -1 else 1) * (if (r == 2) -1 else 1)
      val xr = xl * ph * AacCodec.aacIsGain(isPos)
      val out = AacCodec.decode(Multimodal.aacIntensityStream(d))
      assert(out.channels == 2 && out.pcm.length == 2048)
      for (p <- 0 until 1024) {
        val base = AacCodec.aacCos(p, pos) * AacCodec.aacWin(p)
        assert(out.pcm(2 * p) == xl * base, s"d=$d L p=$p")
        assert(out.pcm(2 * p + 1) == xr * base, s"d=$d R p=$p")
      }
    }
  }

  test("PNS: pinned noise substitution scaled by noise_nrg, gg-independent") {
    for (d <- 0L until 24L) {
      val band = (d % 32).toInt
      val nrg = ((d % 41) - 20).toInt
      val out = AacCodec.decode(Multimodal.aacPnsStream(d))
      assert(out.channels == 1 && out.pcm.length == 1024)
      val gain = AacCodec.aacPnsGain(nrg)
      for (p <- 0 until 1024) {
        var want = 0L
        var k = band * 32
        while (k < (band + 1) * 32) {
          want += AacCodec.aacPnsNoise(band, k) * gain *
            AacCodec.aacCos(p, k) * AacCodec.aacWin(p)
          k += 1
        }
        assert(out.pcm(p) == want, s"d=$d p=$p")
      }
    }
    // global_gain must not touch noise bands: same (band, nrg), other gg
    val x = AacCodec.decode(AacCodec.encodePns(Seq((40, 5, 3)))).pcm
    val y = AacCodec.decode(AacCodec.encodePns(Seq((200, 5, 3)))).pcm
    assert(x.toSeq == y.toSeq)
  }

  test("loud rejects: channel config 3+, mismatched common window, mixed configs") {
    val bytes = Multimodal.aacCpeStream(1L)
    val bad = bytes.clone()
    bad(3) = (bad(3) | 0x40).toByte // channel_configuration 2 -> 3
    assertThrows[IllegalArgumentException](AacCodec.decode(bad))
    // common_window requires matching window structure at encode time
    val long = AacCodec.AacFrame(globalGain = 40, lines = Seq((10, 2, 6)), sfDelta = 0)
    val short = AacCodec.AacFrame(globalGain = 40, lines = Seq((10, 2, 6)),
      sfDelta = 0, shortSeq = true)
    assertThrows[IllegalArgumentException](
      AacCodec.encodeCpe(Seq(AacCodec.AacCpe(long, short))))
    // a mono frame followed by a stereo frame must reject
    val mixedCfg = AacCodec.encode(Seq(long)) ++ Multimodal.aacCpeStream(0L)
    assertThrows[IllegalArgumentException](AacCodec.decode(mixedCfg))
  }
}
