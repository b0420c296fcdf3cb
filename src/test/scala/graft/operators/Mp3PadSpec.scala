package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The Layer III header padding bit under fixed-rate framing: a padded
  * frame spans one extra byte, shifting every later frame's position
  * and the reservoir offsets — yet the PCM must equal the unpadded
  * coding of the same granules (padding is framing, not signal).
  */
class Mp3PadSpec extends AnyFunSuite {

  test("padding is PCM-transparent and really changes the framing") {
    for (d <- 0L until 16L) {
      val padded = Multimodal.mp3PadStream(d)
      val plain = Multimodal.mp3ResvStream(d)
      val a = MpegAudio.decode(padded)
      val b = MpegAudio.decode(plain)
      assert(a.nFrames == 4 && a.channels == 1)
      assert(a.pcm.toSeq == b.pcm.toSeq, s"d=$d")
      // structural: the padded stream is longer by the number of padded
      // frames ((n + d) % 2 over 4 frames = exactly 2)
      assert(padded.length == plain.length + 2, s"d=$d")
    }
  }

  test("a frame's padding bit shifts the NEXT frame's sync position") {
    val s0 = Multimodal.mp3PadStream(1) // frames 0 and 2 padded (d=1)
    val base = 144 * 40 * 1000 / 44100 // bitrate index 2
    // frame 1 starts after frame 0's padded span
    assert((s0(base + 1) & 0xff) == 0xff && ((s0(base + 2) & 0xe0) == 0xe0))
  }
}
