package graft.operators

/** REAL lossy audio: ITU-T G.711 μ-law companding inside a RIFF/WAVE
  * container (format tag 7) — the first rung of the lossy-codec ladder
  * that was previously all stubs. μ-law is the telephony codec: each
  * 16-bit sample is companded to 8 bits through a sign + 3-bit exponent
  * + 4-bit mantissa segmented-log layout, halving again what 16-bit PCM
  * needs while keeping quantization error proportional to amplitude.
  *
  * Why this codec CAN be graded exactly where MP3/VP8 cannot: companding
  * is STATELESS — `decode(encode(s))` is a pure per-sample integer
  * function, so the DuckDB oracle replays the whole lossy round trip in
  * SQL (segmented CASE + integer shifts) and the grade stays hash-exact.
  * Stateful lossy codecs (ADPCM's adaptive step, MP3's subband windows)
  * need the recurrence replayed, which SQL cannot express per-sample —
  * that boundary is documented at [[AdpcmCodec]], which grades bounded
  * error instead.
  *
  * The arithmetic is the classic G.711 implementation (bias 0x84, clip
  * 32635, complemented output byte): encode finds the segment of the
  * biased magnitude, packs sign/exponent/mantissa complemented; decode
  * reconstructs `(132·(2^e − 1) + m·2^(e+3))` with the sign re-applied.
  * Container: canonical 18-byte `fmt ` (cbSize=0) + the `fact` chunk the
  * spec requires for non-PCM formats + odd-size pad on `data`.
  */
object G711Codec {

  private val Bias = 0x84
  private val Clip = 32635

  /** Compand one 16-bit sample to a μ-law byte. */
  def ulawEncode(pcm: Short): Byte = {
    val sign = if (pcm < 0) 0x80 else 0x00
    var mag = if (pcm < 0) -pcm.toInt else pcm.toInt // -32768 → 32768, clipped next
    if (mag > Clip) mag = Clip
    mag += Bias
    // segment = floor(log2(mag)) - 7: the biased magnitude is in
    // [132, 32767], so the top set bit is in [7, 14] and exp in [0, 7]
    var bit = 14
    while (bit > 7 && (mag & (1 << bit)) == 0) bit -= 1
    val exp = bit - 7
    val mantissa = (mag >> (exp + 3)) & 0x0F
    (~(sign | (exp << 4) | mantissa)).toByte
  }

  /** Expand one μ-law byte back to 16-bit PCM. */
  def ulawDecode(u: Byte): Short = {
    val v = (~u) & 0xFF
    val sign = (v & 0x80) != 0
    val exp = (v >> 4) & 0x07
    val mantissa = v & 0x0F
    val mag = (Bias * ((1 << exp) - 1)) + (mantissa << (exp + 3))
    (if (sign) -mag else mag).toShort
  }

  /** Compand one 16-bit sample to an A-law byte — G.711's other law
    * (European trunks): 13-bit operand, segmented like μ-law but with a
    * linear first segment and the 0x55 alternating-bit mask instead of
    * full complementation. Like μ-law it is stateless, so the SQL oracle
    * replays it exactly; unlike μ-law its decode never returns 0 (the
    * smallest reconstruction is ±8), which the spec pins.
    */
  def alawEncode(pcm: Short): Byte = {
    var x = pcm >> 3 // arithmetic shift = floor(pcm/8): the 13-bit operand
    val mask = if (x >= 0) 0xD5 else { x = -x - 1; 0x55 }
    var seg = 0 // segment ends: 0x1F, 0x3F, 0x7F, … = (0x20 << seg) - 1
    while (seg < 8 && x > ((0x20 << seg) - 1)) seg += 1
    if (seg >= 8) (0x7F ^ mask).toByte // unreachable for 13-bit input; safety
    else {
      val q = (if (seg < 2) x >> 1 else x >> seg) & 0x0F
      (((seg << 4) | q) ^ mask).toByte
    }
  }

  /** Expand one A-law byte back to 16-bit PCM. */
  def alawDecode(a: Byte): Short = {
    val v = (a ^ 0x55) & 0xFF
    var t = (v & 0x0F) << 4
    val seg = (v & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else t = (t + 0x108) << (seg - 1)
    (if ((v & 0x80) != 0) t else -t).toShort
  }

  private def encodeWavG711(formatTag: Int, sampleRate: Int, n: Int,
                            enc: Short => Byte, sample: Int => Short): Array[Byte] = {
    require(sampleRate > 0 && n >= 0, s"encodeWavG711: bad args rate=$sampleRate n=$n")
    val pad = n & 1
    val out = new Array[Byte](58 + n + pad)
    def putLe16(off: Int, v: Int): Unit = Riff.putLe16(out, off, v)
    def putLe32(off: Int, v: Int): Unit = Riff.putLe32(out, off, v)
    def putTag(off: Int, s: String): Unit = Riff.putTag(out, off, s)
    putTag(0, "RIFF"); putLe32(4, 50 + n + pad); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 18)
    putLe16(20, formatTag)    // 6 = WAVE_FORMAT_ALAW, 7 = WAVE_FORMAT_MULAW
    putLe16(22, 1)            // mono
    putLe32(24, sampleRate)
    putLe32(28, sampleRate)   // byte rate: 1 byte per sample
    putLe16(32, 1)            // block align
    putLe16(34, 8)            // bits per sample
    putLe16(36, 0)            // cbSize
    putTag(38, "fact"); putLe32(42, 4); putLe32(46, n)
    putTag(50, "data"); putLe32(54, n)
    var i = 0
    while (i < n) { out(58 + i) = enc(sample(i)); i += 1 }
    out
  }

  private def decodeWavG711(b: Array[Byte], formatTag: Int, lawName: String,
                            dec: Byte => Short): WavCodec.DecodedAudio = {
    val c = Riff.scanWave(b)
    require(c.audioFormat == formatTag,
      s"g711: not $lawName (format ${c.audioFormat}, expected $formatTag)")
    require(c.bits == 8, s"g711: $lawName must be 8-bit, got ${c.bits}")
    require(c.channels == 1, s"g711: only mono supported, got ${c.channels} channels")
    val n = math.min(c.dataLen, c.factSamples.getOrElse(c.dataLen))
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = dec(b(c.dataOff + i)); i += 1 }
    WavCodec.DecodedAudio(c.sampleRate, 1, samples)
  }

  /** Encode mono 16-bit PCM into a μ-law WAVE: RIFF + 18-byte fmt
    * (format 7, 8-bit) + fact (true sample count) + data (+ pad).
    */
  def encodeWavUlaw(sampleRate: Int, n: Int, sample: Int => Short): Array[Byte] =
    encodeWavG711(7, sampleRate, n, ulawEncode, sample)

  /** Decode a μ-law WAVE back to 16-bit PCM samples. */
  def decodeWavUlaw(b: Array[Byte]): WavCodec.DecodedAudio =
    decodeWavG711(b, 7, "μ-law", ulawDecode)

  /** Encode mono 16-bit PCM into an A-law WAVE (format 6). */
  def encodeWavAlaw(sampleRate: Int, n: Int, sample: Int => Short): Array[Byte] =
    encodeWavG711(6, sampleRate, n, alawEncode, sample)

  /** Decode an A-law WAVE back to 16-bit PCM samples. */
  def decodeWavAlaw(b: Array[Byte]): WavCodec.DecodedAudio =
    decodeWavG711(b, 6, "A-law", alawDecode)
}
