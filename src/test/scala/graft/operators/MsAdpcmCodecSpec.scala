package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MS ADPCM: tracking-error bounds on the graded signal grid, the MS
  * high-nibble-first order, standalone block decode, fact truncation,
  * container arithmetic (90-byte header with the 7-pair coefficient
  * table), and loud rejection of malformed streams.
  */
class MsAdpcmCodecSpec extends AnyFunSuite {

  private def tri(a: Int, s: Int)(i: Int): Short = {
    val period = 4 * a
    val phase = (i.toLong * s % period).toInt
    (math.abs(phase - 2 * a) - a).toShort
  }

  test("slope-bounded signals track within the adaptive quantizer's error") {
    var worstMax = 0L; var worstMse = 0L
    for (a <- Seq(4000, 8000, 12000); s <- Seq(50, 200, 550)) {
      val n = 1600
      val f = tri(a, s) _
      val dec = MsAdpcmCodec.decodeWavMs(MsAdpcmCodec.encodeWavMs(8000, n, f))
      assert(dec.samples.length == n)
      var maxErr = 0L; var se = 0L
      (0 until n).foreach { i =>
        val e = math.abs(dec.samples(i) - f(i)).toLong
        maxErr = math.max(maxErr, e); se += e * e
      }
      worstMax = math.max(worstMax, maxErr)
      worstMse = math.max(worstMse, se / n)
      assert(maxErr <= 4096, s"a=$a s=$s max err $maxErr")
      assert(se / n <= 65536, s"a=$a s=$s mse ${se / n}")
    }
    info(s"worst max err $worstMax, worst mse $worstMse")
  }

  test("constant signals reproduce exactly after the two header samples") {
    val dec = MsAdpcmCodec.decodeWavMs(
      MsAdpcmCodec.encodeWavMs(8000, 1100, _ => -4321.toShort))
    assert(dec.samples.forall(_ == -4321.toShort))
  }

  test("each block decodes standalone to the same samples (random access)") {
    val n = 1300
    val f = tri(9000, 300) _
    val blockAlign = 256
    val spb = MsAdpcmCodec.samplesPerBlock(blockAlign)
    val wav = MsAdpcmCodec.encodeWavMs(8000, n, f, blockAlign)
    val full = MsAdpcmCodec.decodeWavMs(wav).samples
    val c = Riff.scanWave(wav)
    val headerLen = c.dataOff
    (0 until c.dataLen / blockAlign).foreach { k =>
      val lone = new Array[Byte](headerLen + blockAlign)
      System.arraycopy(wav, 0, lone, 0, headerLen)
      Riff.putLe32(lone, 4, headerLen - 8 + blockAlign)
      val blockSamples = math.min(spb, n - k * spb)
      Riff.putLe32(lone, headerLen - 12, blockSamples) // fact value
      Riff.putLe32(lone, headerLen - 4, blockAlign)    // data size
      System.arraycopy(wav, headerLen + k * blockAlign, lone, headerLen, blockAlign)
      val dec = MsAdpcmCodec.decodeWavMs(lone).samples
      assert(dec.toSeq == full.slice(k * spb, k * spb + blockSamples).toSeq,
        s"block $k standalone decode diverges")
    }
  }

  test("fact chunk truncates the zero-padded last block exactly") {
    val spb = MsAdpcmCodec.samplesPerBlock(256)
    Seq(1, 2, 3, spb - 1, spb, spb + 1, 2 * spb + 13).foreach { n =>
      val wav = MsAdpcmCodec.encodeWavMs(8000, n, i => (i * 11).toShort)
      assert(wav.length == 90 + ((n + spb - 1) / spb) * 256, s"n=$n size ${wav.length}")
      assert(MsAdpcmCodec.decodeWavMs(wav).samples.length == n)
    }
    assert(MsAdpcmCodec.decodeWavMs(
      MsAdpcmCodec.encodeWavMs(8000, 0, _ => 0.toShort)).samples.isEmpty)
  }

  test("compression is 4x-class against 16-bit PCM") {
    val n = 10 * MsAdpcmCodec.samplesPerBlock(256)
    val wav = MsAdpcmCodec.encodeWavMs(8000, n, tri(8000, 200))
    val ratio = (2.0 * n) / (wav.length - 90)
    assert(ratio > 3.8 && ratio < 4.0, s"compression ratio $ratio")
  }

  test("malformed containers are rejected loudly") {
    val ok = MsAdpcmCodec.encodeWavMs(8000, 600, _ => 5.toShort)
    intercept[IllegalArgumentException] { // IMA blob on the MS path
      MsAdpcmCodec.decodeWavMs(AdpcmCodec.encodeWavIma(8000, 600, _ => 5.toShort))
    }
    intercept[IllegalArgumentException] { // ragged data: not whole blocks
      val bad = ok.clone()
      Riff.putLe32(bad, 86, 100)
      MsAdpcmCodec.decodeWavMs(java.util.Arrays.copyOf(bad, 90 + 100))
    }
    intercept[IllegalArgumentException] { // predictor index out of range
      val bad = ok.clone(); bad(90) = 9
      MsAdpcmCodec.decodeWavMs(bad)
    }
  }
}
