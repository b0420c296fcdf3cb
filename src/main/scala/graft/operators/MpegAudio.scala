package graft.operators

/** MPEG-1 Audio Layer I/II decoder (ISO/IEC 11172-3) in pure JDK — the
  * PERCEPTUAL/SUBBAND rung of the lossy-audio ladder: the waveform rungs
  * (G.711, IMA/MS ADPCM) code the time-domain signal directly, while web
  * audio is overwhelmingly frequency-domain coded (MP3/AAC); Layer I/II
  * is the spec's subband layer beneath Layer III, sharing its framing and
  * the 32-band polyphase synthesis filterbank but not yet the Huffman /
  * MDCT stage.
  *
  * What is implemented is the ISO DECODE STRUCTURE, end to end:
  *
  *  - frame parsing: the 32-bit header (11-bit sync, MPEG-1 version
  *    bits, layer bits, bitrate index, sample-rate index, padding, mode)
  *    with FREE-FORMAT framing (bitrate index 0 — spec-legal: frame
  *    length is implied by content, which these fixtures size exactly);
  *  - Layer I side info: 4-bit bit allocation per subband, one 6-bit
  *    scalefactor per allocated subband, 12 granules × 32 subbands of
  *    `nb`-bit sample codes;
  *  - Layer II side info: subband-dependent allocation field widths
  *    (4 bits below sb 11, 3 below 23, 2 to the 30-band limit), the
  *    scale-factor-select (scfsi) machinery sharing 1–3 scalefactors
  *    across the frame's three 12-granule parts (patterns 0=three,
  *    1=(0,1)+2, 2=one, 3=0+(1,2)), per-class GROUPED sample codes
  *    (3/5/9-level quantizers pack three samples into one 5/7/10-bit
  *    code c via s_i = (c / n^i) mod n) and ungrouped codes;
  *  - symmetric mid-tread requantization with the spec's level counts
  *    n = 2^k − 1: numerator 2·raw + 1 − n (zero at the center code);
  *  - the 32-band polyphase SYNTHESIS FILTERBANK structure: per granule
  *    a 64-point matrixing of the 32 subband samples, a 1024-entry V
  *    FIFO shifted by 64, the spec's U selection (U[j·64+i] = V[j·128+i],
  *    U[j·64+32+i] = V[j·128+96+i]) and the 512-tap windowed sum
  *    producing 32 PCM samples.
  *
  * PINNED CONSTANTS, stated honestly (the [[Vp8Codec]] discipline): the
  * spec's out-of-band numeric tables — the cosine matrixing
  * N[i][k] = cos((16+i)(2k+1)π/64), the synthesis window D, and the
  * scalefactor exponents — are replaced by documented INTEGER
  * implementation tables (closed-form formulas below), and the final
  * PCM scaling/clip stage is omitted, so every output sample is an
  * exact integer function of the bitstream and the whole chain is
  * engine-replayable. Swapping the pinned tables for the ISO values and
  * adding the float scaling is a constants-only change. Everything
  * STRUCTURAL — framing, allocation, scfsi, grouping, requantization,
  * FIFO/matrix/window indexing — follows the spec.
  */
object MpegAudio {

  // ---- pinned integer tables (documented implementation values) -----------

  /** Matrixing table stand-in for cos((16+i)(2k+1)π/64), i ∈ 0..63,
    * k ∈ 0..31: varied, sign-mixed, bounded |N| ≤ 15.
    */
  private[operators] def nTab(i: Int, k: Int): Long =
    ((11 * i + 23 * k + 7) % 31) - 15

  /** Synthesis window stand-in for the 512-tap D table: |D| ≤ 14. */
  private[operators] def dTab(x: Int): Long = ((7 * x + 13) % 29) - 14

  /** Integer scalefactor table (6-bit index), all positive. */
  private[operators] def sfTab(idx: Int): Long = 1 + ((3 * idx) % 13)

  // Layer II allocation field widths by subband (spec table-A SHAPE)
  private[operators] def l2AllocBits(sb: Int): Int =
    if (sb < 11) 4 else if (sb < 23) 3 else 2
  private[operators] val L2SbLimit = 30

  /** Layer II quantization classes by allocation value: level count n
    * (odd, mid-tread), grouped flag, and code bits (per triplet when
    * grouped, per sample otherwise). Class 1..15; the spec's 3/5/9
    * grouping and 2^k−1 ladder.
    */
  private[operators] def l2Class(alloc: Int): (Int, Boolean, Int) = alloc match {
    case 1 => (3, true, 5)
    case 2 => (5, true, 7)
    case 3 => (7, false, 3)
    case 4 => (9, true, 10)
    case n => val k = n; ((1 << k) - 1, false, k) // 5..15 → 31..32767 levels
  }

  /** Mid-tread requantization numerator: zero at the center code. */
  private def dequant(raw: Int, n: Int): Long = 2L * raw + 1L - n

  // ---- bit I/O (MSB-first) --------------------------------------------------

  private[operators] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nAcc = 0
    def put(v: Long, bits: Int): Unit = {
      require(bits >= 0 && bits <= 32 && v >= 0 && (bits == 32 || v < (1L << bits)),
        s"BitWriter: $v does not fit $bits bits")
      acc = (acc << bits) | v
      nAcc += bits
      while (nAcc >= 8) {
        out.write(((acc >> (nAcc - 8)) & 0xff).toInt)
        nAcc -= 8
      }
      (): Unit
    }
    def padToByte(): Unit = if (nAcc > 0) put(0, 8 - nAcc)
    def bytes(): Array[Byte] = { padToByte(); out.toByteArray }
  }

  private[operators] final class BitReader(buf: Array[Byte], var pos: Int) {
    private var bit = 0
    def get(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) {
        require(pos < buf.length, "mpeg audio: bitstream truncated")
        v = (v << 1) | ((buf(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def atEnd: Boolean = pos >= buf.length
  }

  // ---- synthesis filterbank -------------------------------------------------

  /** The 32-band synthesis state: the spec's 1024-entry V FIFO. */
  private final class Synth {
    private val v = new Array[Long](1024)
    /** One granule: matrix the 32 subband samples into 64 V values,
      * shift the FIFO, window, emit 32 PCM samples.
      */
    def granule(s: Array[Long], outBuf: Array[Long], outOff: Int): Unit = {
      System.arraycopy(v, 0, v, 64, 1024 - 64)
      var i = 0
      while (i < 64) {
        var acc = 0L
        var k = 0
        while (k < 32) { acc += nTab(i, k) * s(k); k += 1 }
        v(i) = acc
        i += 1
      }
      // U selection + 512-tap windowed sum (spec indexing)
      i = 0
      while (i < 32) {
        var acc = 0L
        var j = 0
        while (j < 8) {
          acc += dTab((2 * j) * 32 + i) * v(j * 128 + i)
          acc += dTab((2 * j + 1) * 32 + i) * v(j * 128 + 96 + i)
          j += 1
        }
        outBuf(outOff + i) = acc
        i += 1
      }
      (): Unit
    }
  }

  // ---- encode (fixture generator) -------------------------------------------

  /** One Layer I mono frame: per-subband allocation nibble (0 or nb−1),
    * scalefactor indices, and 12×32 raw codes.
    */
  final case class L1Frame(alloc: Array[Int], sf: Array[Int],
                           raw: Array[Array[Int]]) // raw(granule)(subband)

  /** One Layer II mono frame: per-subband class allocation, scfsi
    * pattern, transmitted scalefactors (up to 3), and 36×32 raw codes
    * (grouped classes read them back per triplet).
    */
  final case class L2Frame(alloc: Array[Int], scfsi: Array[Int],
                           sf: Array[Array[Int]], raw: Array[Array[Int]])

  private def header(layer: Int, channels: Int = 1): (BitWriter => Unit) = bw => {
    bw.put(0x7ff, 11) // sync
    bw.put(3, 2) // MPEG-1
    bw.put(if (layer == 1) 3 else 2, 2) // layer bits: 11 = I, 10 = II
    bw.put(1, 1) // no CRC
    bw.put(0, 4) // bitrate index 0 = free format
    bw.put(0, 2) // sample rate 44100
    bw.put(0, 1) // padding
    bw.put(0, 1) // private
    bw.put(if (channels == 1) 3 else 0, 2) // mode: 11 mono / 00 stereo
    bw.put(0, 2) // mode extension
    bw.put(0, 1) // copyright
    bw.put(0, 1) // original
    bw.put(0, 2) // emphasis
  }

  /** One Layer I STEREO frame: the spec interleave — allocation per
    * (sb, ch), scalefactors per (sb, ch), samples per (granule, sb, ch).
    */
  def encodeL1Stereo(alloc: (Int, Int) => Int, sf: (Int, Int) => Int,
                     raw: (Int, Int, Int) => Int): Array[Byte] = {
    val bw = new BitWriter
    header(1, 2)(bw)
    var sb = 0
    while (sb < 32) {
      var ch = 0
      while (ch < 2) { bw.put(alloc(ch, sb).toLong, 4); ch += 1 }
      sb += 1
    }
    sb = 0
    while (sb < 32) {
      var ch = 0
      while (ch < 2) {
        if (alloc(ch, sb) > 0) bw.put(sf(ch, sb).toLong, 6)
        ch += 1
      }
      sb += 1
    }
    var g = 0
    while (g < 12) {
      sb = 0
      while (sb < 32) {
        var ch = 0
        while (ch < 2) {
          if (alloc(ch, sb) > 0) {
            val nb = alloc(ch, sb) + 1
            val r = raw(g, ch, sb)
            require(r >= 0 && r < (1 << nb) - 1,
              s"layer1 stereo: raw $r out of $nb-bit mid-tread domain")
            bw.put(r.toLong, nb)
          }
          ch += 1
        }
        sb += 1
      }
      g += 1
    }
    bw.bytes()
  }

  /** One Layer II STEREO frame: allocation/scfsi/scalefactors per
    * (sb, ch); per triplet, per sb, per ch a grouped code or 3 samples.
    */
  def encodeL2Stereo(alloc: (Int, Int) => Int, scfsi: (Int, Int) => Int,
                     sf: (Int, Int, Int) => Int,
                     raw: (Int, Int, Int) => Int): Array[Byte] = {
    val bw = new BitWriter
    header(2, 2)(bw)
    var sb = 0
    while (sb < L2SbLimit) {
      var ch = 0
      while (ch < 2) { bw.put(alloc(ch, sb).toLong, l2AllocBits(sb)); ch += 1 }
      sb += 1
    }
    sb = 0
    while (sb < L2SbLimit) {
      var ch = 0
      while (ch < 2) {
        if (alloc(ch, sb) > 0) bw.put(scfsi(ch, sb).toLong, 2)
        ch += 1
      }
      sb += 1
    }
    sb = 0
    while (sb < L2SbLimit) {
      var ch = 0
      while (ch < 2) {
        if (alloc(ch, sb) > 0) {
          val m = scfsi(ch, sb) match {
            case 0 => 3
            case 2 => 1
            case _ => 2
          }
          var i = 0
          while (i < m) { bw.put(sf(ch, sb, i).toLong, 6); i += 1 }
        }
        ch += 1
      }
      sb += 1
    }
    var t = 0
    while (t < 12) {
      sb = 0
      while (sb < L2SbLimit) {
        var ch = 0
        while (ch < 2) {
          if (alloc(ch, sb) > 0) {
            val (n, grouped, bits) = l2Class(alloc(ch, sb))
            if (grouped) {
              val s0 = raw(3 * t, ch, sb); val s1 = raw(3 * t + 1, ch, sb)
              val s2 = raw(3 * t + 2, ch, sb)
              require(s0 < n && s1 < n && s2 < n,
                "layer2 stereo: grouped code out of domain")
              bw.put((s2.toLong * n + s1) * n + s0, bits)
            } else {
              var i = 0
              while (i < 3) {
                val r = raw(3 * t + i, ch, sb)
                require(r >= 0 && r < n,
                  s"layer2 stereo: raw $r out of $n-level domain")
                bw.put(r.toLong, bits)
                i += 1
              }
            }
          }
          ch += 1
        }
        sb += 1
      }
      t += 1
    }
    bw.bytes()
  }

  def encodeL1Frame(f: L1Frame): Array[Byte] = {
    require(f.alloc.length == 32 && f.sf.length == 32 && f.raw.length == 12)
    val bw = new BitWriter
    header(1)(bw)
    var sb = 0
    while (sb < 32) { bw.put(f.alloc(sb).toLong, 4); sb += 1 }
    sb = 0
    while (sb < 32) {
      if (f.alloc(sb) > 0) bw.put(f.sf(sb).toLong, 6)
      sb += 1
    }
    var g = 0
    while (g < 12) {
      sb = 0
      while (sb < 32) {
        if (f.alloc(sb) > 0) {
          val nb = f.alloc(sb) + 1
          require(f.raw(g)(sb) >= 0 && f.raw(g)(sb) < (1 << nb) - 1,
            s"layer1: raw ${f.raw(g)(sb)} out of $nb-bit mid-tread domain")
          bw.put(f.raw(g)(sb).toLong, nb)
        }
        sb += 1
      }
      g += 1
    }
    bw.bytes()
  }

  def encodeL2Frame(f: L2Frame): Array[Byte] = {
    require(f.alloc.length == L2SbLimit && f.raw.length == 36)
    val bw = new BitWriter
    header(2)(bw)
    var sb = 0
    while (sb < L2SbLimit) { bw.put(f.alloc(sb).toLong, l2AllocBits(sb)); sb += 1 }
    sb = 0
    while (sb < L2SbLimit) {
      if (f.alloc(sb) > 0) bw.put(f.scfsi(sb).toLong, 2)
      sb += 1
    }
    sb = 0
    while (sb < L2SbLimit) {
      if (f.alloc(sb) > 0) {
        val n = f.scfsi(sb) match {
          case 0 => 3
          case 2 => 1
          case _ => 2
        }
        var i = 0
        while (i < n) { bw.put(f.sf(sb)(i).toLong, 6); i += 1 }
      }
      sb += 1
    }
    var t = 0
    while (t < 12) {
      sb = 0
      while (sb < L2SbLimit) {
        if (f.alloc(sb) > 0) {
          val (n, grouped, bits) = l2Class(f.alloc(sb))
          if (grouped) {
            val s0 = f.raw(3 * t)(sb); val s1 = f.raw(3 * t + 1)(sb)
            val s2 = f.raw(3 * t + 2)(sb)
            require(s0 < n && s1 < n && s2 < n, "layer2: grouped code out of domain")
            bw.put((s2.toLong * n + s1) * n + s0, bits)
          } else {
            var i = 0
            while (i < 3) {
              val r = f.raw(3 * t + i)(sb)
              require(r >= 0 && r < n, s"layer2: raw $r out of $n-level domain")
              bw.put(r.toLong, bits)
              i += 1
            }
          }
        }
        sb += 1
      }
      t += 1
    }
    bw.bytes()
  }

  // ---- decode ----------------------------------------------------------------

  /** Decoded stream: layer, channel count, frame count, and the
    * full-precision fixed-point PCM, sample-major interleaved for stereo
    * (L0, R0, L1, R1, …); the pinned profile omits the final scale/clip.
    */
  final case class MpegPcm(layer: Int, channels: Int, nFrames: Int,
                           pcm: Array[Long])

  def decode(bytes: Array[Byte]): MpegPcm = {
    val br = new BitReader(bytes, 0)
    var synths: Array[Synth] = null
    val pcmOut = scala.collection.mutable.ArrayBuffer.empty[Long]
    var layer = 0
    var channels = 0
    var nFrames = 0
    while (!br.atEnd) {
      require(br.get(11) == 0x7ff, "mpeg audio: lost sync")
      require(br.get(2) == 3, "mpeg audio: not MPEG-1")
      val layerBits = br.get(2)
      val thisLayer = layerBits match {
        case 3 => 1
        case 2 => 2
        case 1 => throw new IllegalArgumentException(
          "mpeg audio: Layer III needs the Huffman/MDCT stage — outside this profile")
        case _ => throw new IllegalArgumentException("mpeg audio: reserved layer bits")
      }
      require(layer == 0 || layer == thisLayer, "mpeg audio: mixed layers in one stream")
      layer = thisLayer
      require(br.get(1) == 1, "mpeg audio: CRC frames outside this profile")
      require(br.get(4) == 0, "mpeg audio: only free-format framing in this profile")
      require(br.get(2) == 0, "mpeg audio: fixture sample-rate index must be 0")
      br.get(1) // padding
      br.get(1) // private
      val mode = br.get(2)
      val nCh = mode match {
        case 3 => 1
        case 0 => 2 // independent stereo
        case _ => throw new IllegalArgumentException(
          "mpeg audio: joint/dual-channel modes outside this profile")
      }
      require(channels == 0 || channels == nCh,
        "mpeg audio: mixed channel modes in one stream")
      channels = nCh
      if (synths == null) synths = Array.fill(nCh)(new Synth)
      br.get(2); br.get(1); br.get(1); br.get(2) // mode ext, (c), original, emphasis

      val nGran = if (layer == 1) 12 else 36
      // per-(channel, granule, subband) dequantized samples
      val samples = Array.fill(nCh, nGran, 32)(0L)

      if (layer == 1) {
        val alloc = Array.fill(nCh, 32)(0)
        var sb = 0
        while (sb < 32) {
          var ch = 0
          while (ch < nCh) { alloc(ch)(sb) = br.get(4); ch += 1 }
          sb += 1
        }
        val sf = Array.fill(nCh, 32)(0)
        sb = 0
        while (sb < 32) {
          var ch = 0
          while (ch < nCh) {
            if (alloc(ch)(sb) > 0) sf(ch)(sb) = br.get(6)
            ch += 1
          }
          sb += 1
        }
        var g = 0
        while (g < 12) {
          sb = 0
          while (sb < 32) {
            var ch = 0
            while (ch < nCh) {
              if (alloc(ch)(sb) > 0) {
                val nb = alloc(ch)(sb) + 1
                val n = (1 << nb) - 1
                val raw = br.get(nb)
                require(raw < n, "mpeg audio: code outside the mid-tread domain")
                samples(ch)(g)(sb) = dequant(raw, n) * sfTab(sf(ch)(sb))
              }
              ch += 1
            }
            sb += 1
          }
          g += 1
        }
      } else {
        val alloc = Array.fill(nCh, L2SbLimit)(0)
        var sb = 0
        while (sb < L2SbLimit) {
          var ch = 0
          while (ch < nCh) { alloc(ch)(sb) = br.get(l2AllocBits(sb)); ch += 1 }
          sb += 1
        }
        val scfsi = Array.fill(nCh, L2SbLimit)(0)
        sb = 0
        while (sb < L2SbLimit) {
          var ch = 0
          while (ch < nCh) {
            if (alloc(ch)(sb) > 0) scfsi(ch)(sb) = br.get(2)
            ch += 1
          }
          sb += 1
        }
        val sf = Array.fill(nCh, L2SbLimit, 3)(0)
        sb = 0
        while (sb < L2SbLimit) {
          var ch = 0
          while (ch < nCh) {
            if (alloc(ch)(sb) > 0) scfsi(ch)(sb) match {
              case 0 =>
                sf(ch)(sb)(0) = br.get(6); sf(ch)(sb)(1) = br.get(6)
                sf(ch)(sb)(2) = br.get(6)
              case 1 =>
                val a = br.get(6); val b = br.get(6)
                sf(ch)(sb)(0) = a; sf(ch)(sb)(1) = a; sf(ch)(sb)(2) = b
              case 2 =>
                val a = br.get(6)
                sf(ch)(sb)(0) = a; sf(ch)(sb)(1) = a; sf(ch)(sb)(2) = a
              case _ =>
                val a = br.get(6); val b = br.get(6)
                sf(ch)(sb)(0) = a; sf(ch)(sb)(1) = b; sf(ch)(sb)(2) = b
            }
            ch += 1
          }
          sb += 1
        }
        var t = 0
        while (t < 12) {
          sb = 0
          while (sb < L2SbLimit) {
            var ch = 0
            while (ch < nCh) {
              if (alloc(ch)(sb) > 0) {
                val (n, grouped, bits) = l2Class(alloc(ch)(sb))
                val part = t / 4 // granule 3t..3t+2 is in part (3t)/12 = t/4
                val sfv = sfTab(sf(ch)(sb)(part))
                if (grouped) {
                  var c = br.get(bits)
                  require(c < n * n * n, "mpeg audio: grouped code out of domain")
                  var i = 0
                  while (i < 3) {
                    samples(ch)(3 * t + i)(sb) = dequant(c % n, n) * sfv
                    c /= n
                    i += 1
                  }
                } else {
                  var i = 0
                  while (i < 3) {
                    val raw = br.get(bits)
                    require(raw < n, "mpeg audio: code outside the mid-tread domain")
                    samples(ch)(3 * t + i)(sb) = dequant(raw, n) * sfv
                    i += 1
                  }
                }
              }
              ch += 1
            }
            sb += 1
          }
          t += 1
        }
      }

      // synthesis per channel, PCM interleaved sample-major
      val outCh = Array.fill(nCh)(new Array[Long](32))
      var g = 0
      while (g < nGran) {
        var ch = 0
        while (ch < nCh) {
          synths(ch).granule(samples(ch)(g), outCh(ch), 0)
          ch += 1
        }
        var i = 0
        while (i < 32) {
          var ch2 = 0
          while (ch2 < nCh) { pcmOut += outCh(ch2)(i); ch2 += 1 }
          i += 1
        }
        g += 1
      }
      br.alignByte()
      nFrames += 1
    }
    require(nFrames > 0, "mpeg audio: empty stream")
    MpegPcm(layer, channels, nFrames, pcmOut.toArray)
  }
}
