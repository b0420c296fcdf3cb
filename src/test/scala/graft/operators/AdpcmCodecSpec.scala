package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** IMA ADPCM: encode↔decode tracking-error bounds for slope-bounded
  * signals, block random-access independence, fact-chunk truncation,
  * container arithmetic, and loud rejection of malformed blocks — the
  * sample-exact grading surface the SQL oracle cannot replay (stateful
  * recurrence), pinned here instead.
  */
class AdpcmCodecSpec extends AnyFunSuite {

  /** Triangle wave: amplitude A, slope S per sample — the slope-bounded
    * signal class the graded query synthesizes.
    */
  private def tri(a: Int, s: Int)(i: Int): Short = {
    val period = 4 * a
    val phase = (i.toLong * s % period).toInt
    (math.abs(phase - 2 * a) - a).toShort
  }

  test("slope-bounded signals track within the adaptive quantizer's error") {
    var worst = 0
    for (a <- Seq(4000, 8000, 12000); s <- Seq(50, 200, 550)) {
      val n = 1600
      val f = tri(a, s) _
      val dec = AdpcmCodec.decodeWavIma(AdpcmCodec.encodeWavIma(8000, n, f))
      assert(dec.samples.length == n)
      val errs = (0 until n).map(i => math.abs(dec.samples(i) - f(i)))
      worst = math.max(worst, errs.max)
      assert(errs.max <= 2560, s"a=$a s=$s max err ${errs.max}")
      val mse = errs.map(e => e.toLong * e).sum / n
      assert(mse <= 16384, s"a=$a s=$s mse $mse")
    }
    info(s"worst tracking error over the signal grid: $worst")
  }

  test("constant signals reproduce exactly after the header sample") {
    val dec = AdpcmCodec.decodeWavIma(
      AdpcmCodec.encodeWavIma(8000, 1200, _ => 1234.toShort))
    assert(dec.samples.forall(_ == 1234.toShort))
  }

  test("each block decodes standalone to the same samples (random access)") {
    val n = 1600
    val f = tri(9000, 300) _
    val blockAlign = 256
    val spb = AdpcmCodec.samplesPerBlock(blockAlign)
    val wav = AdpcmCodec.encodeWavIma(8000, n, f, blockAlign)
    val full = AdpcmCodec.decodeWavIma(wav).samples
    val c = Riff.scanWave(wav)
    val nBlocks = c.dataLen / blockAlign
    (0 until nBlocks).foreach { k =>
      val lone = new Array[Byte](60 + blockAlign)
      System.arraycopy(wav, 0, lone, 0, 60) // header template
      Riff.putLe32(lone, 4, 52 + blockAlign)
      val blockSamples = math.min(spb, n - k * spb)
      Riff.putLe32(lone, 48, blockSamples)   // fact
      Riff.putLe32(lone, 56, blockAlign)     // data size
      System.arraycopy(wav, 60 + k * blockAlign, lone, 60, blockAlign)
      val dec = AdpcmCodec.decodeWavIma(lone).samples
      assert(dec.toSeq == full.slice(k * spb, k * spb + blockSamples).toSeq,
        s"block $k standalone decode diverges")
    }
  }

  test("fact chunk truncates the zero-padded last block exactly") {
    val spb = AdpcmCodec.samplesPerBlock(256)
    Seq(1, spb - 1, spb, spb + 1, 2 * spb + 17).foreach { n =>
      val wav = AdpcmCodec.encodeWavIma(8000, n, i => (i * 7).toShort)
      val expectBlocks = (n + spb - 1) / spb
      assert(wav.length == 60 + expectBlocks * 256, s"n=$n size ${wav.length}")
      assert(AdpcmCodec.decodeWavIma(wav).samples.length == n)
    }
    assert(AdpcmCodec.decodeWavIma(
      AdpcmCodec.encodeWavIma(8000, 0, _ => 0.toShort)).samples.isEmpty)
  }

  test("compression is 4x-class against 16-bit PCM") {
    val n = 10 * AdpcmCodec.samplesPerBlock(256)
    val wav = AdpcmCodec.encodeWavIma(8000, n, tri(8000, 200))
    val pcmBytes = 2 * n
    val ratio = pcmBytes.toDouble / (wav.length - 60)
    assert(ratio > 3.9 && ratio < 4.0, s"compression ratio $ratio")
  }

  test("malformed containers are rejected loudly") {
    val ok = AdpcmCodec.encodeWavIma(8000, 600, _ => 5.toShort)
    intercept[IllegalArgumentException] { // PCM routed here
      AdpcmCodec.decodeWavIma(WavCodec.encodePcm16(8000, 4, _ => 1.toShort))
    }
    intercept[IllegalArgumentException] { // ragged data: not whole blocks
      val bad = ok.clone()
      Riff.putLe32(bad, 56, 200)
      AdpcmCodec.decodeWavIma(java.util.Arrays.copyOf(bad, 60 + 200))
    }
    intercept[IllegalArgumentException] { // reserved header byte abused
      val bad = ok.clone(); bad(63) = 1
      AdpcmCodec.decodeWavIma(bad)
    }
  }
}
