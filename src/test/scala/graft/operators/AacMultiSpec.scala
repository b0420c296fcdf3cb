package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ADTS frames carrying MULTIPLE raw_data_blocks: the 2-bit
  * number_of_raw_data_blocks_in_frame field, per-block END + byte
  * alignment, one frame_length covering every block, and grouping
  * TRANSPARENCY — the grouped stream must decode to the same PCM as
  * one-block-per-frame framing of the same blocks.
  */
class AacMultiSpec extends AnyFunSuite {

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

  test("grouped raw data blocks decode like one-per-frame framing") {
    for (d <- 0L until 24L) {
      val nb = (3 + d % 2).toInt
      val grouped = AacCodec.decode(Multimodal.aacMultiStream(d))
      val flat = AacCodec.decode(AacCodec.encode((0 until nb).map(frameOf(d, _))))
      assert(grouped.nFrames == nb, s"d=$d")
      assert(grouped.pcm.toSeq == flat.pcm.toSeq, s"d=$d")
    }
  }

  test("the block count field is honored, not inferred") {
    // two blocks under one header: dropping the second block's content
    // breaks the frame_length check loudly
    val two = AacCodec.encodeGrouped(Seq(Seq(frameOf(1, 0), frameOf(1, 1))))
    assert(AacCodec.decode(two).nFrames == 2)
    val truncated = java.util.Arrays.copyOf(two, two.length - 1)
    assertThrows[IllegalArgumentException](AacCodec.decode(truncated))
  }
}
