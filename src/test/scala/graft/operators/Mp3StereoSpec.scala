package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer III stereo — independent L/R, MS, intensity, and
  * MS+intensity — graded against an independent linearity replay: the
  * per-channel effective line sets are derived here from the stereo
  * mixing rules (not by running the decoder), then pushed through the
  * same alias/IMDCT/polyphase algebra the mono spec pinned, with the
  * sample-major interleave applied at the end.
  */
class Mp3StereoSpec extends AnyFunSuite {

  /** Linearity replay for one stereo frame (2 granules): `linesOf(gi,
    * ch)` are the POST-MIXING spectral lines of output channel ch.
    */
  private def replay(linesOf: (Int, Int) => Seq[(Int, Long)]): Array[Long] = {
    val totalSteps = 36
    val pcm = new Array[Long](totalSteps * 32 * 2)
    for (gi <- 0 until 2; ch <- 0 to 1; (pos, xr) <- linesOf(gi, ch)) {
      val sb = pos / 18
      val k = pos % 18
      val contribs =
        if (k >= 10 && sb < 31)
          Seq((sb, k, 2L + (17 - k) % 3), (sb + 1, 17 - k, 1L + (17 - k) % 2))
        else if (k <= 7 && sb >= 1)
          Seq((sb, k, 2L + k % 3), (sb - 1, 17 - k, -(1L + k % 2)))
        else Seq((sb, k, 1L))
      for ((sbp, kp, w) <- contribs; p <- 0 until 36) {
        val gs = if (p < 18) gi * 18 + p else (gi + 1) * 18 + (p - 18)
        if (gs < totalSteps) {
          val ss = gs % 18
          val sgn = if (sbp % 2 == 1 && ss % 2 == 1) -1L else 1L
          val tval = xr * w * (((7 * p + 11 * kp + 3) % 23) - 11) *
            (1 + ((5 * p + 2) % 9)) * sgn
          for (m <- 0 to 15; if gs + m < totalSteps; i <- 0 until 32)
            pcm(((gs + m) * 32 + i) * 2 + ch) +=
              tval * MpegAudio.nTab((m % 2) * 32 + i, sbp) * MpegAudio.dTab(m * 32 + i)
        }
      }
    }
    pcm
  }

  /** Transmitted line of (granule, channel) per the fixture plan:
    * position and requantized value — re-derived here, not read back.
    */
  private def txLine(d: Long, gi: Int, ch: Int): (Int, Long) = {
    val r = (d % 4).toInt
    val pos =
      if (r == 0) {
        if (ch == 0) ((17 + 37 * d + 101 * gi) % 576).toInt
        else ((29 + 41 * d + 89 * gi) % 576).toInt
      } else if (r == 1) ((17 + 37 * d + 101 * gi) % 576).toInt
      else if (ch == 0) (300 + ((37 * d + 101 * gi) % 270)).toInt
      else ((13 + 7 * d + 11 * gi) % 64).toInt
    val v = (1 + (d + 3 * gi + 5 * ch) % 13).toInt
    val gg = ((29 * d + 7 * gi + 13 * ch) % 256).toInt
    val band = math.min(pos / 26, 21)
    val sfv = if (band > 20) 0 else ((d + band + gi + ch) % 7).toInt
    val mag = v.toLong * (v + 2) * (1 + gg % 9) * (1 + (3 * sfv) % 11)
    (pos, if ((d + 5 * gi + ch) % 2 == 1) -mag else mag)
  }

  /** Post-mixing line set of output channel `ch` (the stereo rules). */
  private def mixed(d: Long, gi: Int, ch: Int): Seq[(Int, Long)] = {
    val r = (d % 4).toInt
    val (posL, xl) = txLine(d, gi, 0)
    val (posR, xrv) = txLine(d, gi, 1)
    r match {
      case 0 => if (ch == 0) Seq((posL, xl)) else Seq((posR, xrv))
      case 1 => // MS butterfly at the shared position
        if (ch == 0) Seq((posL, xl + xrv)) else Seq((posL, xl - xrv))
      case _ =>
        // intensity: is_pos is the RIGHT channel's scalefactor at the
        // left line's band (0 for band 21); split kL = p, kR = 6 - p
        val band = math.min(posL / 26, 21)
        val isPos = if (band > 20) 0 else ((d + band + gi + 1) % 7).toInt
        val hi = if (ch == 0) (posL, xl * isPos) else (posL, xl * (6 - isPos))
        // below the region: MS when mode_extension has the MS bit (r=3),
        // plain L/R otherwise (r=2); the left channel has no line there
        val lo: Seq[(Int, Long)] =
          if (r == 3) Seq((posR, if (ch == 0) xrv else -xrv))
          else if (ch == 1) Seq((posR, xrv))
          else Nil
        hi +: lo
    }
  }

  test("stereo shapes: decode matches the independent mixing replay") {
    for (d <- 0L until 32L) {
      val out = MpegAudio.decode(Multimodal.mp3StereoStream(d))
      assert(out.layer == 3 && out.channels == 2 && out.nFrames == 1)
      assert(out.pcm.length == 2304)
      val want = replay((gi, ch) => mixed(d, gi, ch))
      assert(out.pcm.toSeq == want.toSeq, s"d=$d mode ${d % 4}")
    }
  }

  test("MS butterfly is value-visible: ext=2 differs from independent coding") {
    // same granules, joint MS vs plain stereo headers -> different PCM
    val dJ = 1L // r = 1: MS
    val joint = MpegAudio.decode(Multimodal.mp3StereoStream(dJ)).pcm
    // rebuild the identical stream with mode 00 by re-deriving the plan
    def gran(gi: Int, ch: Int): MpegAudio.L3Granule = {
      val d = dJ
      val v = (1 + (d + 3 * gi + 5 * ch) % 13).toInt
      MpegAudio.L3Granule(
        lines = Seq((((17 + 37 * d + 101 * gi) % 576).toInt,
          if ((d + 5 * gi + ch) % 2 == 1) -v else v)),
        globalGain = ((29 * d + 7 * gi + 13 * ch) % 256).toInt,
        scalefacCompress = 15,
        tableSelect = Array((12 + d % 3).toInt, (12 + (d + 1) % 3).toInt,
          (12 + (d + 2) % 3).toInt),
        region0Count = (d % 6).toInt, region1Count = (d % 4).toInt,
        preflag = 0, scalefacScale = 0, count1Table = 0, count1Quads = 0,
        stuffBits = (3 * ((d + gi + ch) % 2)).toInt,
        scalefac = band => ((d + band + gi + ch) % 7).toInt)
    }
    val indep = MpegAudio.decode(MpegAudio.encodeL3Stereo(Array(0, 0),
      Array(Array(gran(0, 0), gran(0, 1)), Array(gran(1, 0), gran(1, 1))))).pcm
    assert(joint.toSeq != indep.toSeq)
  }

  test("loud rejects: dual-channel mode and joint stereo outside Layer III") {
    // dual channel (mode 10) in the header of an otherwise-valid stream
    val bytes = Multimodal.mp3StereoStream(0L)
    val dual = bytes.clone()
    dual(3) = ((dual(3) & 0x3f) | 0x80).toByte // mode bits 10
    assertThrows[IllegalArgumentException](MpegAudio.decode(dual))
    // a Layer I stereo frame with mode switched to joint must reject
    val l1 = MpegAudio.encodeL1Stereo(
      (_, sb) => if (sb == 3) 2 else 0,
      (_, sb) => if (sb == 3) 1 else 0,
      (_, _, sb) => if (sb == 3) 1 else 0)
    val l1Joint = l1.clone()
    l1Joint(3) = ((l1Joint(3) & 0x3f) | 0x40).toByte // mode bits 01
    assertThrows[IllegalArgumentException](MpegAudio.decode(l1Joint))
  }
}
