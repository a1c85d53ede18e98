package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** REAL audio decode — a pure-JVM RIFF/WAVE (PCM 16-bit LE) codec, the
  * audio sibling of [[ImageCodec]] (ref: the multimodal stage a training
  * pipeline runs over opaque `binary` columns; cf.
  * /root/reference data-extract surface, which ships blobs untyped).
  *
  * `decode` walks the RIFF chunk list (`fmt ` then `data`, tolerating
  * unknown chunks in between — real encoders emit `LIST`/`fact`),
  * validates the PCM header, and extracts the feature-extraction
  * contract of an audio stage: sample rate, channel count, exact sample
  * count, integer duration, exact Σ|sample| and peak amplitude, plus a
  * bounded STRIDED FRAME SAMPLE (≤ [[maxFrames]] evenly-spaced samples —
  * the audio analog of video frame sampling: a fixed-size probe of the
  * waveform regardless of clip length). Truncated or malformed payloads
  * yield `ok = false` with zeroed metadata, never an exception — at
  * 100 TB a corrupt blob must cost one flagged row, not a task retry.
  *
  * Everything emitted is integer arithmetic so a SQL oracle reproduces
  * it in closed form: the encoder exists to PLANT deterministic
  * fixtures (sample i of clip `id` is `(id·7919 + i·104729) mod 65536 −
  * 32768`), and q_audio_meta / q_audio_frames hash-match those integers
  * against a DuckDB generate_series replay that never sees a decoder.
  *
  * Execution shape is per-partition (mapPartitions) so a heavier codec
  * (resampler, filterbank) would amortize init across a batch.
  */
object AudioCodec {

  /** Evenly-spaced probe samples per clip (stride = ceil(n/maxFrames)). */
  val maxFrames = 8

  final case class AudioMeta(doc_id: Long, fmt: String, sample_rate: Int,
      channels: Int, n_samples: Long, duration_ms: Long, sum_abs: Long,
      peak: Int, frames: Seq[Int], ok: Boolean)

  // ---- encoder (fixture planting) ----

  /** Canonical 44-byte-header RIFF/WAVE, PCM16 LE mono: sample i = s(i). */
  def encodeWav(sampleRate: Int, n: Int, s: Int => Int): Array[Byte] = {
    val dataSize = n * 2
    val out = new Array[Byte](44 + dataSize)
    def putLE32(pos: Int, v: Int): Unit = {
      out(pos) = (v & 0xff).toByte
      out(pos + 1) = ((v >> 8) & 0xff).toByte
      out(pos + 2) = ((v >> 16) & 0xff).toByte
      out(pos + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLE16(pos: Int, v: Int): Unit = {
      out(pos) = (v & 0xff).toByte
      out(pos + 1) = ((v >> 8) & 0xff).toByte
    }
    def putTag(pos: Int, tag: String): Unit = {
      var i = 0
      while (i < 4) { out(pos + i) = tag.charAt(i).toByte; i += 1 }
    }
    putTag(0, "RIFF"); putLE32(4, 36 + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); putLE32(16, 16)
    putLE16(20, 1)              // PCM
    putLE16(22, 1)              // mono
    putLE32(24, sampleRate)
    putLE32(28, sampleRate * 2) // byte rate
    putLE16(32, 2)              // block align
    putLE16(34, 16)             // bits per sample
    putTag(36, "data"); putLE32(40, dataSize)
    var i = 0
    while (i < n) {
      val v = s(i)
      out(44 + 2 * i) = (v & 0xff).toByte
      out(44 + 2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  // ---- decoder ----

  private def fail(id: Long): AudioMeta =
    AudioMeta(id, "wav", 0, 0, 0L, 0L, 0L, 0, Nil, ok = false)

  /** Chunk-walking decode; never throws. */
  def decode(id: Long, b: Array[Byte]): AudioMeta = {
    if (b == null || b.length < 12) return fail(id)
    def tag(p: Int): String =
      new String(Array(b(p), b(p + 1), b(p + 2), b(p + 3)), "US-ASCII")
    def le32(p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    def le16(p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return fail(id)
    // Cursor is a Long: a junk chunk declaring sz near 2^31 must not wrap
    // the advance negative and re-enter the loop at a bogus offset — it
    // walks past b.length and falls out to fail(id) like any corrupt blob.
    var pos = 12L
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= b.length && (sampleRate < 0 || dataOff < 0)) {
      val p = pos.toInt
      val t = tag(p); val sz = le32(p + 4)
      if (sz < 0) return fail(id)
      if (t == "fmt ") {
        if (sz < 16 || p + 8 + 16 > b.length) return fail(id)
        if (le16(p + 8) != 1) return fail(id) // PCM only
        channels = le16(p + 10)
        sampleRate = le32(p + 12)
        bits = le16(p + 22)
      } else if (t == "data") {
        dataOff = p + 8; dataLen = sz
      }
      pos += 8L + sz + (sz & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || channels != 1 || bits != 16 || dataOff < 0)
      return fail(id)
    // declared data must be fully present — a truncated blob is corrupt
    if (dataOff.toLong + dataLen > b.length) return fail(id)
    val n = dataLen / 2
    var sumAbs = 0L; var peak = 0
    var i = 0
    while (i < n) {
      val v = ((b(dataOff + 2 * i) & 0xff) |
        (b(dataOff + 2 * i + 1) << 8)).toShort.toInt
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      i += 1
    }
    val stride = if (n == 0) 1 else (n + maxFrames - 1) / maxFrames
    val frames = (0 until n by math.max(stride, 1)).map { j =>
      ((b(dataOff + 2 * j) & 0xff) | (b(dataOff + 2 * j + 1) << 8)).toShort.toInt
    }
    val durMs = if (n == 0) 0L else n.toLong * 1000L / sampleRate
    AudioMeta(id, "wav", sampleRate, channels, n.toLong, durMs, sumAbs,
      peak, frames, ok = true)
  }

  // ---- Spark plumbing ----

  /** Deterministic fixture plant over the documents table: clip length
    * n = 200 + id mod 301, sample rate 8000·(1 + id mod 3), sample i =
    * (id·7919 + i·104729) mod 65536 − 32768, and every id ≡ 0 (mod 19)
    * is TRUNCATED mid-payload (the corrupt path). One row per document:
    * (doc_id, blob binary). */
  def plantAudio(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = (200 + id % 301).toInt
        val sr = (8000 * (1 + id % 3)).toInt
        val s = (i: Int) => (((id * 7919L + i * 104729L) % 65536L) - 32768L).toInt
        val full = encodeWav(sr, n, s)
        val blob = if (id % 19 == 0) full.take(full.length - n) else full
        (id, blob)
      }
    }.toDF("doc_id", "blob")
  }

  /** Per-partition real decode over (idCol long, blobCol binary) — same
    * batch shape as [[ImageCodec.extractImageMeta]]. */
  def extractAudioMeta(df: DataFrame, idCol: String, blobCol: String): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        decode(r.getLong(idIdx),
          if (r.isNullAt(blobIdx)) null else r.getAs[Array[Byte]](blobIdx))
      }
    }
  }
}
