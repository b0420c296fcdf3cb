package graft.operators

/** REAL stateful lossy audio, third rung: Microsoft ADPCM inside
  * RIFF/WAVE (format tag 0x0002). Where IMA ADPCM predicts from ONE
  * previous sample with a table-driven step walk, MS ADPCM predicts from
  * TWO (a fixed 2-tap linear predictor chosen per block from the seven
  * standard coefficient pairs) and adapts its quantizer multiplicatively
  * through the 16-entry adaptation table — one structural step closer to
  * the LPC-class codecs (FLAC's predictors, speech codecs) than IMA's
  * delta walk.
  *
  * Block layout (mono, the WAV standard): 7-byte state header
  * (bPredictor, iDelta int16, iSamp1 int16, iSamp2 int16) then one
  * signed 4-bit code per sample, HIGH nibble first (MS order — IMA is
  * low-first; mixing them up corrupts every odd sample, which the spec
  * pins). iSamp2 is the OLDER sample and is emitted first; the first two
  * samples of every block travel verbatim in the header, so each block
  * decodes standalone — the same random-access/split property as IMA and
  * parquet row groups.
  *
  * Grading: fully hash-exact since round 15 ([[AdpcmCodec]]'s
  * recursive-CTE oracle discipline) — q_msadpcm_exact replays the
  * complete recurrence per sample: the two-tap prediction (exactly
  * samp1 at predictor 0), the truncating code division, the
  * multiplicative 16-entry adaptation, both clamps, the verbatim
  * two-sample block headers, and the per-block initial-delta estimate.
  * q_audio_msadpcm keeps the closed-form container/count grades and the
  * spec-derived error-bound booleans.
  */
object MsAdpcmCodec {

  /** The seven standard predictor pairs, ×256 fixed point. */
  private val Coef1: Array[Int] = Array(256, 512, 0, 192, 240, 460, 392)
  private val Coef2: Array[Int] = Array(0, -256, 0, 64, 0, -208, -232)

  private val Adaptation: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  private def clampSample(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  /** Samples one `blockAlign`-byte mono block holds: 2 in the header +
    * 2 codes per remaining byte.
    */
  def samplesPerBlock(blockAlign: Int): Int = (blockAlign - 7) * 2 + 2

  private def nextDelta(code: Int, delta: Int): Int =
    math.max(16, (Adaptation(code & 0x0F) * delta) >> 8)

  // truncating division like the reference C decoders, NOT >>8: they
  // differ on negative predictions and reference streams decode with /256
  private def predict(s1: Int, s2: Int, pred: Int): Int =
    (s1 * Coef1(pred) + s2 * Coef2(pred)) / 256

  /** Encode mono 16-bit PCM as MS ADPCM. Predictor 0 (pure 1-tap, coef
    * 256/0) is used for every block — any of the seven is a valid
    * stream; choosing per-block is an encoder-quality knob, not a format
    * requirement. `fact` carries the true count; the last block
    * zero-pads.
    */
  def encodeWavMs(sampleRate: Int, n: Int, sample: Int => Short,
                  blockAlign: Int = 256): Array[Byte] = {
    require(sampleRate > 0 && n >= 0, s"encodeWavMs: bad args rate=$sampleRate n=$n")
    require(blockAlign >= 8, s"encodeWavMs: blockAlign $blockAlign too small")
    val spb = samplesPerBlock(blockAlign)
    val nBlocks = if (n == 0) 0 else (n + spb - 1) / spb
    val dataBytes = nBlocks * blockAlign
    // fmt: 16 base + cbSize(2) + wSamplesPerBlock(2) + wNumCoef(2) + 7*4
    val fmtLen = 16 + 2 + 2 + 2 + 28
    val headerLen = 12 + 8 + fmtLen + 12 + 8
    val out = new Array[Byte](headerLen + dataBytes)
    def putLe16(off: Int, v: Int): Unit = Riff.putLe16(out, off, v)
    def putLe32(off: Int, v: Int): Unit = Riff.putLe32(out, off, v)
    def putTag(off: Int, s: String): Unit = Riff.putTag(out, off, s)
    putTag(0, "RIFF"); putLe32(4, headerLen - 8 + dataBytes); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, fmtLen)
    putLe16(20, 0x0002)         // WAVE_FORMAT_ADPCM
    putLe16(22, 1)              // mono
    putLe32(24, sampleRate)
    putLe32(28, (sampleRate.toLong * blockAlign / spb).toInt)
    putLe16(32, blockAlign)
    putLe16(34, 4)              // bits per coded sample
    putLe16(36, 32)             // cbSize
    putLe16(38, spb)            // wSamplesPerBlock
    putLe16(40, 7)              // wNumCoef
    var c = 0
    while (c < 7) {
      putLe16(42 + 4 * c, Coef1(c) & 0xffff)
      putLe16(44 + 4 * c, Coef2(c) & 0xffff)
      c += 1
    }
    val factOff = 20 + fmtLen
    putTag(factOff, "fact"); putLe32(factOff + 4, 4); putLe32(factOff + 8, n)
    putTag(factOff + 12, "data"); putLe32(factOff + 16, dataBytes)
    val dataOff = factOff + 20

    var b = 0
    var s = 0
    while (b < nBlocks) {
      val base = dataOff + b * blockAlign
      val pred = 0
      val s2 = sample(s).toInt                         // older
      val s1 = (if (s + 1 < n) sample(s + 1) else 0.toShort).toInt
      // initial delta: mean |prediction error| over the early window /4,
      // floored at 16 — any positive choice is valid, the table adapts
      var estimate = 0L
      var j = s + 2
      val jEnd = math.min(n, s + math.min(spb, 18))
      var prev1 = s1; var prev2 = s2
      while (j < jEnd) {
        val d = sample(j).toInt - predict(prev1, prev2, pred)
        estimate += math.abs(d)
        prev2 = prev1; prev1 = sample(j).toInt
        j += 2
      }
      val span = math.max(1, (jEnd - (s + 2) + 1) / 2)
      var delta = math.max(16, (estimate / span / 4L).toInt)
      out(base) = pred.toByte
      putLe16(base + 1, delta & 0xffff)
      putLe16(base + 3, s1 & 0xffff)
      putLe16(base + 5, s2 & 0xffff)
      var samp1 = s1; var samp2 = s2
      var i = 2
      while (i < spb) {
        val idx = s + i
        val code =
          if (idx < n) {
            val p = predict(samp1, samp2, pred)
            val diff = sample(idx).toInt - p
            val q = math.max(-8, math.min(7, diff / delta))
            val rec = clampSample(p + q * delta)
            samp2 = samp1; samp1 = rec
            delta = nextDelta(q, delta)
            q & 0x0F
          } else 0
        val off = base + 7 + (i - 2) / 2
        if ((i & 1) == 0) out(off) = (code << 4).toByte       // high nibble first
        else out(off) = (out(off) | code).toByte
        i += 1
      }
      s += spb
      b += 1
    }
    out
  }

  /** Decode an MS ADPCM WAVE to 16-bit PCM, truncated to `fact`. */
  def decodeWavMs(b: Array[Byte]): WavCodec.DecodedAudio = {
    val c = Riff.scanWave(b)
    require(c.audioFormat == 0x0002, s"msadpcm: not MS ADPCM (format ${c.audioFormat})")
    require(c.bits == 4, s"msadpcm: expected 4-bit codes, got ${c.bits}")
    require(c.channels == 1, s"msadpcm: only mono supported, got ${c.channels} channels")
    val blockAlign = c.blockAlign
    require(blockAlign >= 8, s"msadpcm: implausible blockAlign $blockAlign")
    require(c.dataLen % blockAlign == 0,
      s"msadpcm: data length ${c.dataLen} is not whole ${blockAlign}-byte blocks")
    // extra = cbSize fields: wSamplesPerBlock(2) wNumCoef(2) coef pairs
    require(c.extra.length >= 6, "msadpcm: fmt extra too short for MS ADPCM")
    val spb = Riff.le16(c.extra, 2)
    require(spb == samplesPerBlock(blockAlign),
      s"msadpcm: header says $spb samples/block, layout implies ${samplesPerBlock(blockAlign)}")
    val nCoef = Riff.le16(c.extra, 4)
    require(nCoef >= 7 && c.extra.length >= 6 + 4 * nCoef,
      s"msadpcm: coefficient table truncated ($nCoef pairs declared)")
    val coef1 = Array.tabulate(nCoef)(i => Riff.le16(c.extra, 6 + 4 * i).toShort.toInt)
    val coef2 = Array.tabulate(nCoef)(i => Riff.le16(c.extra, 8 + 4 * i).toShort.toInt)
    val nBlocks = c.dataLen / blockAlign
    val total = nBlocks * spb
    val n = math.min(total, c.factSamples.getOrElse(total))
    val samples = new Array[Short](n)
    var blockI = 0
    var outI = 0
    while (blockI < nBlocks && outI < n) {
      val base = c.dataOff + blockI * blockAlign
      val pred = b(base) & 0xff
      require(pred < nCoef, s"msadpcm: predictor $pred out of range in block $blockI")
      var delta = Riff.le16(b, base + 1).toShort.toInt
      require(delta > 0, s"msadpcm: non-positive iDelta $delta in block $blockI")
      var samp1 = Riff.le16(b, base + 3).toShort.toInt
      var samp2 = Riff.le16(b, base + 5).toShort.toInt
      samples(outI) = samp2.toShort; outI += 1      // older sample first
      if (outI < n) { samples(outI) = samp1.toShort; outI += 1 }
      var i = 2
      while (i < spb && outI < n) {
        val byte = b(base + 7 + (i - 2) / 2) & 0xff
        val nib = if ((i & 1) == 0) byte >> 4 else byte & 0x0F
        val code = if (nib >= 8) nib - 16 else nib  // sign-extend 4-bit
        val p = (samp1 * coef1(pred) + samp2 * coef2(pred)) / 256
        val rec = clampSample(p + code * delta)
        samp2 = samp1; samp1 = rec
        samples(outI) = rec.toShort; outI += 1
        delta = nextDelta(code, delta)
        i += 1
      }
      blockI += 1
    }
    WavCodec.DecodedAudio(c.sampleRate, 1, samples)
  }
}
