package graft.operators

import graft.SparkTestBase

class FlacCodecSpec extends SparkTestBase {

  private def gen(seed: Long, n: Int, quant: Int = 1): Array[Short] =
    Array.tabulate(n) { i =>
      val u = (31L * seed + 7L * i) % 65536L
      ((u - u % quant) - 32768L).toShort
    }

  private def roundTrip(rate: Int, channels: Int, s: Array[Short],
                        blockSize: Int = 64, mode: FlacCodec.Mode = FlacCodec.Fixed(2),
                        stereo: Int = 0, forceEscape: Boolean = false): Unit = {
    val bytes = FlacCodec.encodeFlac(rate, channels, s, blockSize, mode, stereo, forceEscape)
    assert(FlacCodec.isFlac(bytes))
    val d = FlacCodec.decodeFlac(bytes)
    assert(d.sampleRate == rate && d.channels == channels)
    assert(java.util.Arrays.equals(d.samples, s),
      s"mismatch rate=$rate ch=$channels mode=$mode stereo=$stereo escape=$forceEscape")
  }

  test("flac round-trips sample-exactly: every subframe mode × mono/stereo") {
    val modes = Seq[FlacCodec.Mode](
      FlacCodec.Verbatim,
      FlacCodec.Fixed(0, 0), FlacCodec.Fixed(1, 1), FlacCodec.Fixed(2, 2),
      FlacCodec.Fixed(3, 0), FlacCodec.Fixed(4, 1),
      FlacCodec.Lpc(Array(3, -1), shift = 1, precision = 4, partOrder = 1),
      FlacCodec.Lpc(Array(10, -5, 1), shift = 3, precision = 6, partOrder = 2))
    for (m <- modes; seed <- Seq(0L, 17L)) {
      roundTrip(8000, 1, gen(seed, 171), mode = m)
      for (st <- Seq(0, 8, 10)) roundTrip(44100, 2, gen(seed, 342), mode = m, stereo = st)
    }
  }

  test("flac exercises the spec corners: wasted bits, escape partitions, constants, short tail") {
    roundTrip(16000, 1, gen(3, 130, quant = 4), mode = FlacCodec.Fixed(2, 2)) // wasted bits
    roundTrip(16000, 2, gen(5, 260, quant = 8), stereo = 10)
    roundTrip(8000, 1, gen(9, 100), forceEscape = true) // escaped verbatim partitions
    roundTrip(8000, 2, gen(9, 200), stereo = 8, forceEscape = true)
    roundTrip(8000, 1, Array.fill[Short](200)(1234), mode = FlacCodec.Fixed(4, 2)) // constant blocks
    roundTrip(8000, 1, gen(1, 65), blockSize = 64) // 1-sample last block → order clamp
    roundTrip(8000, 1, gen(2, 17), blockSize = 16,
      mode = FlacCodec.Lpc(Array(1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1), 4, 5))
    // LPC order >= short last block falls back to a legal fixed subframe
  }

  test("flac multi-frame streams decode across frame boundaries with UTF-8 frame numbers") {
    // > 128 frames forces a 2-byte UTF-8-coded frame number
    roundTrip(8000, 1, gen(7, 140 * 16), blockSize = 16)
  }

  test("flac extreme samples survive every predictor") {
    val edges = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1,
      Short.MinValue, Short.MaxValue, Short.MaxValue, Short.MinValue, 100)
    val s = Array.tabulate[Short](120)(i => edges(i % edges.length))
    for (m <- Seq[FlacCodec.Mode](FlacCodec.Fixed(4, 1), FlacCodec.Verbatim,
      FlacCodec.Lpc(Array(2, -1), 1, 3)))
      roundTrip(8000, 1, s, mode = m)
    roundTrip(8000, 2, s, stereo = 10) // side channel needs the 17th bit
  }

  test("flac rejects malformed streams loudly, never misdecodes") {
    val good = FlacCodec.encodeFlac(8000, 1, gen(11, 100))
    def corrupt(at: Int, to: Byte): Array[Byte] = {
      val b = good.clone(); b(at) = to; b
    }
    intercept[IllegalArgumentException](FlacCodec.decodeFlac("nope".getBytes ++ good.drop(4)))
    intercept[IllegalArgumentException](FlacCodec.decodeFlac(good.take(good.length / 2))) // truncated
    intercept[IllegalArgumentException](FlacCodec.decodeFlac(corrupt(4 + 4 + 34, 0x00))) // bad sync
    // flip a bit inside the entropy stream → CRC-16 catches it
    intercept[IllegalArgumentException] {
      val d = FlacCodec.decodeFlac(corrupt(good.length - 5, (good(good.length - 5) ^ 0x40).toByte))
      // if decode "succeeds", the samples must differ → the assert makes silence impossible
      assert(java.util.Arrays.equals(d.samples, gen(11, 100))); throw new IllegalArgumentException("x")
    }
    // STREAMINFO not first
    val noSi = good.clone(); noSi(4) = (0x80 | 1).toByte
    intercept[IllegalArgumentException](FlacCodec.decodeFlac(noSi))
  }

  test("flac fixture + transcode wire through the Multimodal audio surface") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val flac = Multimodal.withFlacMedia(docs)
    val stats = Multimodal.decodeAudioStats(flac).collect()
    assert(stats.nonEmpty)
    val byId = stats.map(s => s.doc_id -> s).toMap
    // replay one doc closed-form
    val one = stats.minBy(_.doc_id)
    val nc = docs.selectExpr("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap.apply(one.doc_id)
    val n = ((48 + nc % 120) * (1 + one.doc_id % 2)).toInt
    val q = if (one.doc_id % 11 == 0) 4 else 1
    val exp = gen(one.doc_id, n, q)
    assert(one.n_samples == n)
    assert(one.sample_sum == exp.map(_.toLong).sum)
    // FLAC → WAV transcode: stats identical except media_bytes becomes the WAV size
    val wav = Multimodal.decodeAudioStats(Multimodal.transcodeAudio(flac, "wav")).collect()
    assert(wav.length == stats.length)
    wav.foreach { w =>
      val f = byId(w.doc_id)
      assert(w.sample_rate == f.sample_rate && w.n_samples == f.n_samples &&
        w.sample_sum == f.sample_sum && w.sample_checksum == f.sample_checksum &&
        w.peak_abs == f.peak_abs)
      assert(w.media_bytes == 44 + 2 * w.n_samples)
    }
    // WAV → FLAC direction keeps both encoders in the loop
    val back = Multimodal.decodeAudioStats(
      Multimodal.transcodeAudio(Multimodal.withAudioMedia(docs), "flac")).collect()
    val wavDirect = Multimodal.decodeAudioStats(Multimodal.withAudioMedia(docs)).collect()
      .map(s => s.doc_id -> s).toMap
    back.foreach { b =>
      val d = wavDirect(b.doc_id)
      assert(b.sample_checksum == d.sample_checksum && b.n_samples == d.n_samples)
    }
  }
}
