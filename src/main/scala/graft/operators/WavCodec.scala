package graft.operators

/** Real audio codec for RIFF/WAVE PCM — the audio analog of [[ImageCodec]]:
  * uncompressed 16-bit PCM is raw little-endian samples behind a chunked
  * RIFF header (WAVE spec: `RIFF` size `WAVE`, a 16-byte `fmt ` chunk with
  * audioFormat=1, then a `data` chunk), so decode is pure arithmetic with
  * no codec library. Unknown chunks (`LIST`, `fact`, …) are skipped the way
  * the spec requires, padding byte included.
  *
  * Compressed audio (MP3/AAC/Opus) genuinely needs codec libraries this
  * environment does not ship; [[Multimodal.FakeCodec]] remains the labeled
  * stand-in for those.
  */
object WavCodec {

  /** A decoded PCM clip: interleaved 16-bit samples in file order. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                samples: Array[Short])

  /** `Some(())`-style sniff: true iff the blob leads with RIFF…WAVE. */
  def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Encode mono 16-bit PCM: canonical 44-byte header + LE samples.
    * `sample(i)` is the i-th signed 16-bit sample.
    */
  def encodePcm16(sampleRate: Int, n: Int, sample: Int => Short): Array[Byte] =
    encodePcm16Ch(sampleRate, 1, n, sample)

  /** Multi-channel variant: `n` is the TOTAL interleaved sample count
    * (`frames × channels`), `sample(i)` the i-th interleaved sample.
    */
  def encodePcm16Ch(sampleRate: Int, channels: Int, n: Int,
                    sample: Int => Short): Array[Byte] = {
    require(sampleRate > 0 && n >= 0, s"encodePcm16: bad args rate=$sampleRate n=$n")
    require(channels > 0 && channels <= 64, s"encodePcm16: bad channel count $channels")
    require(n % channels == 0, s"encodePcm16: $n samples not a multiple of $channels channels")
    val dataBytes = 2 * n
    val out = new Array[Byte](44 + dataBytes)
    def putLe16(off: Int, v: Int): Unit = Riff.putLe16(out, off, v)
    def putLe32(off: Int, v: Int): Unit = Riff.putLe32(out, off, v)
    def putTag(off: Int, s: String): Unit = Riff.putTag(out, off, s)
    putTag(0, "RIFF"); putLe32(4, 36 + dataBytes); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1)              // PCM
    putLe16(22, channels)
    putLe32(24, sampleRate)
    putLe32(28, sampleRate * 2 * channels) // byte rate
    putLe16(32, 2 * channels)   // block align
    putLe16(34, 16)             // bits per sample
    putTag(36, "data"); putLe32(40, dataBytes)
    var i = 0
    while (i < n) { putLe16(44 + 2 * i, sample(i) & 0xffff); i += 1 }
    out
  }

  /** Decode 16-bit PCM WAVE: chunk-scan to `fmt ` and `data` (skipping
    * unknown chunks with their odd-size pad byte), validate PCM/16-bit,
    * return the interleaved samples. Throws IllegalArgumentException on
    * anything malformed — callers that must tolerate garbage catch it
    * (see [[Multimodal.decodeFeatures]]'s fallback pattern).
    */
  def decodePcm16(b: Array[Byte]): DecodedAudio = {
    require(isWav(b), "wav: missing RIFF/WAVE signature")
    var fmtOff = -1; var dataOff = -1; var dataLen = -1
    def le16(i: Int): Int = Riff.le16(b, i)
    def le32(i: Int): Int = Riff.le32(b, i)
    var p = 12
    while (p + 8 <= b.length && (fmtOff < 0 || dataOff < 0)) {
      val tag = Riff.tag(b, p)
      val size = le32(p + 4)
      require(size >= 0 && p + 8 + size.toLong <= b.length,
        s"wav: chunk '$tag' size $size overruns the ${b.length}-byte blob")
      if (tag == "fmt ") {
        // the PCM format block is 16 bytes; a shorter declared chunk would
        // read format fields out of the neighboring chunk's bytes
        require(size >= 16, s"wav: 'fmt ' chunk too short ($size bytes, need 16)")
        fmtOff = p + 8
      } else if (tag == "data") { dataOff = p + 8; dataLen = size }
      p += 8 + size + (size & 1) // chunks are word-aligned: odd sizes pad
    }
    require(fmtOff >= 0, "wav: no 'fmt ' chunk")
    require(dataOff >= 0, "wav: no 'data' chunk")
    val audioFormat = le16(fmtOff)
    val channels = le16(fmtOff + 2)
    val sampleRate = le32(fmtOff + 4)
    val bits = le16(fmtOff + 14)
    require(audioFormat == 1, s"wav: only PCM (1) supported, got format $audioFormat")
    require(bits == 16, s"wav: only 16-bit supported, got $bits-bit")
    require(channels > 0 && channels <= 64, s"wav: implausible channel count $channels")
    require(sampleRate > 0, s"wav: bad sample rate $sampleRate")
    require(dataLen % 2 == 0, s"wav: odd data length $dataLen for 16-bit samples")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = le16(dataOff + 2 * i).toShort; i += 1 }
    DecodedAudio(sampleRate, channels, samples)
  }
}
