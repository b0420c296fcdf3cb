package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer III MIXED blocks (block_type 2 with mixed_block_flag),
  * graded against an independent linearity replay written separately
  * from the codec: the long part (slots 0..35) keeps natural order,
  * long-band scalefactors with pretab and the NORMAL long window; the
  * short part is transmitted band-major-then-window over per-window
  * lines f >= 12 (the pinned band 0 contributing only its 12..15
  * tail), requantized with per-window scalefactors and subblock gains
  * and run through the 12-point filterbank; alias reduction butterflies
  * ONLY the long-long subband boundary.
  */
class Mp3MixedSpec extends AnyFunSuite {

  private def expected(d: Long): Array[Long] = {
    val totalSteps = 4 * 18
    val pcm = new Array[Long](totalSteps * 32)
    for (gi <- 0 until 4) {
      val pos = gi match {
        case 0 => ((5 + 29 * d) % 26).toInt
        case 1 => (48 + (37 * d) % 528).toInt
        case 2 => (36 + d % 12).toInt
        case _ => (26 + (7 * d) % 10).toInt
      }
      val v = (1 + (d + 3 * gi) % 13).toInt
      val neg = (d + 5 * gi) % 2 == 1
      val gain = 1 + ((29 * d + 7 * gi) % 256) % 9
      val sc = ((d + gi) % 16).toInt
      val sscale = ((d / 4 + gi) % 2).toInt
      def emit(sbp: Int, tval: Long, gs: Int): Unit = {
        if (gs < totalSteps) {
          for (m <- 0 to 15; if gs + m < totalSteps; i <- 0 until 32)
            pcm((gs + m) * 32 + i) +=
              tval * MpegAudio.nTab((m % 2) * 32 + i, sbp) * MpegAudio.dTab(m * 32 + i)
        }
      }
      if (pos < 36) {
        // long part: natural order, slen1 scalefactors over pinned long
        // bands 0..1, pretab, NORMAL long window, and the alias
        // butterflies confined to the single long-long boundary
        val band = pos / 26
        val slen = sc >> 2
        val sfRaw = (3 * d + band + gi) % (1L << slen)
        val pre = ((d / 2 + gi) % 2).toInt
        val sfv = sfRaw + (if (pre == 1) band % 3 else 0)
        val att = 1 + ((3 * sfv * (1 + sscale)) % 11)
        val mag = v.toLong * (v + 2) * gain * att
        val xr = if (neg) -mag else mag
        val sb = pos / 18
        val k = pos % 18
        def win0(p: Int): Long = 1 + ((5 * p + 2) % 9)
        val alias =
          if (k >= 10 && sb == 0)
            Seq((sb, k, 2L + (17 - k) % 3), (sb + 1, 17 - k, 1L + (17 - k) % 2))
          else if (k <= 7 && sb == 1)
            Seq((sb, k, 2L + k % 3), (sb - 1, 17 - k, -(1L + k % 2)))
          else Seq((sb, k, 1L))
        for ((sbp, kp, w0) <- alias; p <- 0 until 36) {
          val gs = if (p < 18) gi * 18 + p else (gi + 1) * 18 + (p - 18)
          if (gs < totalSteps) {
            val ss = gs % 18
            val sgn = if (sbp % 2 == 1 && ss % 2 == 1) -1L else 1L
            val tval = xr * w0 * (((7 * p + 11 * kp + 3) % 23) - 11) *
              win0(p) * sgn
            emit(sbp, tval, gs)
          }
        }
      } else {
        // short part: mixed transmitted mapping -> (band, window, f)
        val t = pos - 36
        val (b, w, f) =
          if (t < 12) (0, t / 4, 12 + t % 4)
          else {
            val u = t - 12
            (1 + u / 48, (u % 48) / 16, 16 * (1 + u / 48) + u % 16)
          }
        val sb = f / 6
        val i = f % 6
        val slen = if (b <= 5) sc >> 2 else sc & 3
        val sfv = ((d + 2 * w + b) % (1L << slen)).toInt
        val att = 1 + ((3L * sfv * (1 + sscale)) % 11)
        val subg = 1 + (5L * ((d + w + gi) % 8)) % 7
        val mag = v.toLong * (v + 2) * gain * att * subg
        val xr = if (neg) -mag else mag
        for (p <- 0 until 12) {
          val s36 = 6 + 6 * w + p
          val gs = if (s36 < 18) gi * 18 + s36 else (gi + 1) * 18 + s36 - 18
          if (gs < totalSteps) {
            val ss = gs % 18
            val sgn = if (sb % 2 == 1 && ss % 2 == 1) -1L else 1L
            val tval = xr * ((19 * p + 7 * i + 3) % 17 - 8) *
              (1 + (5 * p) % 11) * sgn
            emit(sb, tval, gs)
          }
        }
      }
    }
    pcm
  }

  test("mixed-block walk matches the independent replay") {
    for (d <- 0L until 24L) {
      val out = MpegAudio.decode(Multimodal.mp3MixedStream(d))
      assert(out.layer == 3 && out.channels == 1 && out.nFrames == 2)
      assert(out.pcm.length == 2304)
      assert(out.pcm.toSeq == expected(d).toSeq, s"d=$d")
    }
  }

  test("mixed flag is value-visible against a pure-short stream") {
    // same granule content coded mixed vs pure short must differ: the
    // long part's lines move through a different scalefactor layout,
    // window class, and alias treatment
    var diff = 0
    for (d <- 0L until 8L) {
      val mixed = MpegAudio.decode(Multimodal.mp3MixedStream(d)).pcm
      val stream = Multimodal.mp3SwitchStream(d)
      val short = MpegAudio.decode(stream).pcm
      if (mixed.toSeq != short.toSeq) diff += 1
    }
    assert(diff > 0)
  }
}
