package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer III STEREO x WINDOW-SWITCHING, graded against an
  * independent linearity replay: per-channel block types inside one
  * frame (independent short|long and START|STOP), joint MS with both
  * channels short, and joint MS across MISMATCHED block types — MS
  * mixes in unreordered slot space, so the short-coded source's slot
  * rides the OTHER channel's alias + 36-point long filterbank (and a
  * long-coded slot rides the short channel's 12-point path). The
  * replay derives the slot from the SOURCE granule's block type and
  * the synthesis path from the OUTPUT channel's.
  */
class Mp3SwStereoSpec extends AnyFunSuite {

  private def expected(d: Long): Array[Long] = {
    val r = (d % 4).toInt
    def btOf(ch: Int): Int = r match {
      case 0 => if (ch == 0) 2 else 0
      case 1 => 2
      case 2 => if (ch == 0) 1 else 3
      case _ => if (ch == 0) 2 else 0
    }
    val joint = r == 1 || r == 3
    val totalSteps = 2 * 18
    val pcm = new Array[Long](totalSteps * 32 * 2) // interleaved L/R
    for (gi <- 0 until 2; src <- 0 until 2) {
      val btS = btOf(src)
      val pos = ((17 + 37 * d + 101 * gi + 53 * src) % 576).toInt
      val v = (1 + (d + 3 * gi + 5 * src) % 13).toInt
      val neg = (d + 5 * gi + src) % 2 == 1
      val gain = 1 + ((29 * d + 7 * gi + 13 * src) % 256) % 9
      val sc = ((d + gi + src) % 16).toInt
      val sscale = ((d / 4 + gi + src) % 2).toInt
      // requantized line value and its unreordered SLOT (source bt)
      val (slot, xr0) =
        if (btS == 2) {
          val s = pos / 48
          val w = (pos % 48) / 16
          val f = 16 * s + pos % 16
          val slen = if (s <= 5) sc >> 2 else sc & 3
          val sfv = ((d + 2 * w + s + src) % (1L << slen)).toInt
          val att = 1 + ((3L * sfv * (1 + sscale)) % 11)
          val subg = 1 + (5L * ((d + w + gi + src) % 8)) % 7
          val mag = v.toLong * (v + 2) * gain * att * subg
          ((f / 6) * 18 + w * 6 + f % 6, if (neg) -mag else mag)
        } else {
          val band = math.min(pos / 26, 21)
          val slen = if (band <= 10) sc >> 2 else sc & 3
          val sfRaw = if (band > 20) 0L else (3 * d + band + gi + src) % (1L << slen)
          val pre = ((d / 2 + gi + src) % 2).toInt
          val sfv = sfRaw + (if (pre == 1) band % 3 else 0)
          val att = 1 + ((3 * sfv * (1 + sscale)) % 11)
          val mag = v.toLong * (v + 2) * gain * att
          (pos, if (neg) -mag else mag)
        }
      for (ch <- 0 until 2) {
        // stereo mapping in slot space
        val valOpt: Option[Long] =
          if (!joint) { if (src == ch) Some(xr0) else None }
          else if (ch == 0) Some(xr0) // L = M + S
          else Some(if (src == 0) xr0 else -xr0) // R = M - S
        valOpt.foreach { xr =>
          val btO = btOf(ch) // synthesis path = OUTPUT channel's bt
          def emit(sbp: Int, tval: Long, gs: Int): Unit = {
            if (gs < totalSteps) {
              for (m <- 0 to 15; if gs + m < totalSteps; i <- 0 until 32)
                pcm(((gs + m) * 32 + i) * 2 + ch) +=
                  tval * MpegAudio.nTab((m % 2) * 32 + i, sbp) *
                    MpegAudio.dTab(m * 32 + i)
            }
          }
          val sb = slot / 18
          val k = slot % 18
          if (btO == 2) {
            // short path: slot decomposes as window-interleaved lines
            val w = k / 6
            val i = k % 6
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
          } else {
            def winSeq(p: Int): Long = btO match {
              case 0 => 1 + ((5 * p + 2) % 9)
              case 1 =>
                if (p < 18) 1 + ((5 * p + 2) % 9)
                else if (p < 24) 7
                else if (p < 30) 1 + (5 * (11 - (p - 24))) % 11
                else 0
              case _ =>
                if (p < 6) 0
                else if (p < 12) 1 + (5 * (p - 6)) % 11
                else if (p < 18) 7
                else 1 + ((5 * p + 2) % 9)
            }
            val alias =
              if (k >= 10 && sb < 31)
                Seq((sb, k, 2L + (17 - k) % 3), (sb + 1, 17 - k, 1L + (17 - k) % 2))
              else if (k <= 7 && sb >= 1)
                Seq((sb, k, 2L + k % 3), (sb - 1, 17 - k, -(1L + k % 2)))
              else Seq((sb, k, 1L))
            for ((sbp, kp, w0) <- alias; p <- 0 until 36) {
              val gs = if (p < 18) gi * 18 + p else (gi + 1) * 18 + (p - 18)
              if (gs < totalSteps) {
                val ss = gs % 18
                val sgn = if (sbp % 2 == 1 && ss % 2 == 1) -1L else 1L
                val tval = xr * w0 * (((7 * p + 11 * kp + 3) % 23) - 11) *
                  winSeq(p) * sgn
                emit(sbp, tval, gs)
              }
            }
          }
        }
      }
    }
    pcm
  }

  test("stereo window-switching shapes match the independent replay") {
    for (d <- 0L until 24L) {
      val out = MpegAudio.decode(Multimodal.mp3SwStereoStream(d))
      assert(out.layer == 3 && out.channels == 2 && out.nFrames == 1)
      assert(out.pcm.length == 2304)
      assert(out.pcm.toSeq == expected(d).toSeq, s"d=$d r=${d % 4}")
    }
  }

  test("MS across mismatched block types is value-visible") {
    // r=3 (MS, short|long) vs the same lines coded independent (r=0
    // geometry): the cross-channel leakage must change the output
    var diff = 0
    for (d0 <- 0L until 8L) {
      val d3 = d0 - d0 % 4 + 3
      val d0i = d0 - d0 % 4
      val a = MpegAudio.decode(Multimodal.mp3SwStereoStream(d3)).pcm
      val b = MpegAudio.decode(Multimodal.mp3SwStereoStream(d0i)).pcm
      if (a.toSeq != b.toSeq) diff += 1
    }
    assert(diff > 0)
  }
}
