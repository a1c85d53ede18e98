package graft.operators

import graft.{SparkSpec, Tables}

/** The real audio codec: encode→decode round trip, chunk-walker
  * tolerance of unknown RIFF chunks, the never-throw corrupt-blob
  * contract, and the bounded frame-sampling invariant. */
class AudioCodecSpec extends SparkSpec {

  private val s = (i: Int) => ((i * 2111) % 65536) - 32768

  test("WAV PCM16 round trip: rate, count, duration, exact sums, peak") {
    val n = 480
    val m = AudioCodec.decode(1L, AudioCodec.encodeWav(16000, n, s))
    assert(m.ok && m.fmt === "wav")
    assert(m.sample_rate === 16000 && m.channels === 1)
    assert(m.n_samples === n.toLong)
    assert(m.duration_ms === n.toLong * 1000 / 16000)
    var sumAbs = 0L; var peak = 0
    (0 until n).foreach { i =>
      val a = math.abs(s(i)); sumAbs += a; if (a > peak) peak = a
    }
    assert(m.sum_abs === sumAbs && m.peak === peak)
  }

  test("frame sample is bounded and evenly strided at any clip length") {
    for (n <- Seq(8, 9, 63, 64, 200, 500, 501)) {
      val m = AudioCodec.decode(2L, AudioCodec.encodeWav(8000, n, s))
      assert(m.ok, s"n=$n")
      assert(m.frames.length <= AudioCodec.maxFrames, s"n=$n")
      val stride = (n + AudioCodec.maxFrames - 1) / AudioCodec.maxFrames
      assert(m.frames === (0 until n by stride).map(s), s"n=$n")
    }
  }

  test("chunk walker tolerates unknown chunks before fmt/data") {
    val base = AudioCodec.encodeWav(8000, 4, s)
    // splice a LIST chunk (odd-sized, to exercise word-align padding)
    // between "WAVE" and "fmt "
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array.fill[Byte](5 + 1)(42)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    val m = AudioCodec.decode(3L, spliced)
    assert(m.ok && m.n_samples === 4L && m.sample_rate === 8000)
    assert(m.sum_abs === AudioCodec.decode(3L, base).sum_abs)
  }

  test("corrupt payloads never throw: truncation, bad magic, stereo, 8-bit, float PCM") {
    val full = AudioCodec.encodeWav(8000, 100, s)
    assert(!AudioCodec.decode(4L, full.take(full.length - 7)).ok)
    assert(!AudioCodec.decode(5L, "RIFFxxxxJUNK".getBytes("US-ASCII")).ok)
    assert(!AudioCodec.decode(6L, null).ok)
    assert(!AudioCodec.decode(7L, Array[Byte]('R', 'I')).ok)
    val stereo = AudioCodec.encodeWav(8000, 10, s)
    stereo(22) = 2 // channels = 2: unsupported, must flag not misread
    assert(!AudioCodec.decode(8L, stereo).ok)
    val bits8 = AudioCodec.encodeWav(8000, 10, s)
    bits8(34) = 8
    assert(!AudioCodec.decode(9L, bits8).ok)
    val ieee = AudioCodec.encodeWav(8000, 10, s)
    ieee(20) = 3 // WAVE_FORMAT_IEEE_FLOAT
    assert(!AudioCodec.decode(10L, ieee).ok)
    // corrupt meta is fully zeroed — the oracle's corrupt-row contract
    assert(AudioCodec.decode(11L, full.take(50)) ===
      AudioCodec.AudioMeta(11L, "wav", 0, 0, 0L, 0L, 0L, 0, Nil, ok = false))
  }

  test("junk chunk with a near-2^31 declared size flags, never indexes negatively") {
    // valid RIFF/WAVE header + one junk chunk whose declared size would
    // wrap an Int cursor negative (Int.MaxValue - 4): the walk must run
    // off the end and flag, not throw ArrayIndexOutOfBoundsException
    val huge = "RIFFxxxxWAVE".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++
      Array[Byte](0xfb.toByte, 0xff.toByte, 0xff.toByte, 0x7f) ++
      Array.fill[Byte](16)(0)
    assert(!AudioCodec.decode(12L, huge).ok)
    // and spliced BEFORE a real fmt/data pair it must still flag (the
    // wrapped cursor would otherwise re-read the early header bytes)
    val base = AudioCodec.encodeWav(8000, 4, s)
    val spliced = base.take(12) ++
      "JUNK".getBytes("US-ASCII") ++
      Array[Byte](0xf0.toByte, 0xff.toByte, 0xff.toByte, 0x7f) ++
      base.drop(12)
    assert(!AudioCodec.decode(13L, spliced).ok)
  }

  test("planted fixtures decode end-to-end over the documents table") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val metas = AudioCodec.extractAudioMeta(
      AudioCodec.plantAudio(docs), "doc_id", "blob").collect()
    assert(metas.length === docs.count())
    metas.foreach { m =>
      if (m.doc_id % 19 == 0) {
        assert(!m.ok && m.n_samples === 0L && m.sum_abs === 0L,
          s"corrupt ${m.doc_id}")
      } else {
        assert(m.ok, s"doc ${m.doc_id}")
        val n = (200 + m.doc_id % 301).toInt
        assert(m.n_samples === n.toLong)
        assert(m.sample_rate === (8000 * (1 + m.doc_id % 3)).toInt)
        assert(m.duration_ms === n.toLong * 1000 / m.sample_rate)
        // closed-form sum — the oracle's generate_series formula
        var sumAbs = 0L
        (0 until n).foreach { i =>
          sumAbs += math.abs(((m.doc_id * 7919L + i * 104729L) % 65536L) - 32768L)
        }
        assert(m.sum_abs === sumAbs, s"doc ${m.doc_id}")
      }
    }
  }
}
