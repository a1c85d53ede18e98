package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** REAL multimodal decode — a pure-JVM image codec for two trivial
  * public formats, with actual pixel decoding and no external codec
  * libraries needed (this retired the early fingerprint-only
  * MultimodalStub; its batching contract lives on below):
  *
  *  - **PPM P6** (netpbm): ASCII header `P6 <w> <h> <maxval>` with
  *    `#` comments, then w·h·3 raw RGB bytes;
  *  - **BMP** (Windows V3, BITMAPINFOHEADER): 24 bpp uncompressed,
  *    bottom-up rows padded to 4 bytes, BGR byte order.
  *
  * `decode` dispatches on the magic bytes, validates the header, and
  * extracts typed metadata plus exact per-channel pixel sums — the
  * feature-extraction contract (width/height/channel stats) a training
  * pipeline's image stage produces. Truncated or malformed payloads
  * yield `ok = false` with zeroed metadata, never an exception — at
  * 100 TB a corrupt blob must cost one flagged row, not a task retry.
  *
  * Execution shape is per-partition ([[extractImageMeta]],
  * mapPartitions, NOT a per-row UDF) so a heavier codec initializes
  * once per batch of rows — the multimodal batching contract every
  * decode/extract stage in this codebase follows (see also
  * [[AudioCodec.extractAudioMeta]] and the frame-sampling query).
  * Both encoders exist so tests and the declared q_image_meta query can
  * PLANT deterministic fixtures: pixel byte i (row-major, top-down,
  * RGB order) of image `id` is `(id·31 + i) mod 256`, which a SQL
  * oracle reproduces in closed form — the BMP writer re-orders those
  * same logical bytes into padded bottom-up BGR rows, and the decoder
  * maps them back, so both formats carry identical channel sums. */
object ImageCodec {

  final case class ImageMeta(doc_id: Long, fmt: String, width: Int,
      height: Int, sum_r: Long, sum_g: Long, sum_b: Long, ok: Boolean)

  // ---- encoders (fixture planting) ----

  /** P6 PPM: logical pixel byte i = px(i), i in [0, w·h·3). */
  def encodePpm(w: Int, h: Int, px: Int => Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h * 3) {
      out(header.length + i) = (px(i) & 0xff).toByte
      i += 1
    }
    out
  }

  /** 24 bpp bottom-up BMP carrying the same logical top-down RGB byte
    * stream px(i) (re-ordered into padded BGR rows). */
  def encodeBmp(w: Int, h: Int, px: Int => Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val offset = 14 + 40
    val out = new Array[Byte](offset + dataSize)
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
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putLE32(2, offset + dataSize) // file size
    putLE32(10, offset)           // pixel data offset
    putLE32(14, 40)               // BITMAPINFOHEADER size
    putLE32(18, w)
    putLE32(22, h)                // positive: bottom-up
    putLE16(26, 1)                // planes
    putLE16(28, 24)               // bpp
    putLE32(30, 0)                // BI_RGB (uncompressed)
    putLE32(34, dataSize)
    var y = 0
    while (y < h) {
      val fileRow = h - 1 - y // logical row y lands in bottom-up position
      var x = 0
      while (x < w) {
        val li = (y * w + x) * 3 // logical RGB byte index
        val fo = offset + fileRow * rowSize + x * 3
        out(fo) = (px(li + 2) & 0xff).toByte     // B
        out(fo + 1) = (px(li + 1) & 0xff).toByte // G
        out(fo + 2) = (px(li) & 0xff).toByte     // R
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- decoder ----

  private def fail(id: Long, fmt: String): ImageMeta =
    ImageMeta(id, fmt, 0, 0, 0L, 0L, 0L, ok = false)

  /** Magic-dispatching decode; never throws. */
  def decode(id: Long, bytes: Array[Byte]): ImageMeta = {
    if (bytes == null || bytes.length < 2) fail(id, "unknown")
    else if (bytes(0) == 'P'.toByte && bytes(1) == '6'.toByte) decodePpm(id, bytes)
    else if (bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) decodeBmp(id, bytes)
    else fail(id, "unknown")
  }

  /** PPM P6 header parse → (w, h, payload offset), or null on failure:
    * magic already checked; then w, h, maxval as ASCII ints separated by
    * whitespace, '#' comments running to end of line. */
  private def parsePpmHeader(b: Array[Byte]): Array[Int] = {
    var pos = 2
    def skipSpaceAndComments(): Boolean = {
      var progressed = true
      while (progressed && pos < b.length) {
        progressed = false
        while (pos < b.length && Character.isWhitespace(b(pos).toChar)) {
          pos += 1; progressed = true
        }
        if (pos < b.length && b(pos) == '#'.toByte) {
          while (pos < b.length && b(pos) != '\n'.toByte) pos += 1
          progressed = true
        }
      }
      pos < b.length
    }
    def readInt(): Int = {
      if (!skipSpaceAndComments()) return -1
      var v = 0L
      var any = false
      while (pos < b.length && b(pos) >= '0'.toByte && b(pos) <= '9'.toByte) {
        v = v * 10 + (b(pos) - '0'.toByte)
        if (v > Int.MaxValue) return -1
        pos += 1; any = true
      }
      if (any) v.toInt else -1
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv != 255) return null
    pos += 1 // exactly one whitespace byte after maxval, then raw payload
    if (pos.toLong + 3L * w * h > b.length) return null
    Array(w, h, pos)
  }

  private def decodePpm(id: Long, b: Array[Byte]): ImageMeta = {
    val hd = parsePpmHeader(b)
    if (hd == null) return fail(id, "ppm")
    val w = hd(0); val h = hd(1); val pos = hd(2)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    val n = w * h
    while (i < n) {
      val o = pos + i * 3
      sr += b(o) & 0xff; sg += b(o + 1) & 0xff; sb += b(o + 2) & 0xff
      i += 1
    }
    ImageMeta(id, "ppm", w, h, sr, sg, sb, ok = true)
  }

  /** BMP V3 24bpp header parse → (w, h, pixel offset, row size), or null
    * on failure. */
  private def parseBmpHeader(b: Array[Byte]): Array[Int] = {
    def le32(p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    def le16(p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    if (b.length < 54) return null
    val offset = le32(10)
    val w = le32(18)
    val h = le32(22)
    val bpp = le16(28)
    val compression = le32(30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0 || offset < 54)
      return null
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (offset.toLong + rowSize.toLong * h > b.length) return null
    Array(w, h, offset, rowSize)
  }

  private def decodeBmp(id: Long, b: Array[Byte]): ImageMeta = {
    val hd = parseBmpHeader(b)
    if (hd == null) return fail(id, "bmp")
    val w = hd(0); val h = hd(1); val offset = hd(2); val rowSize = hd(3)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      val fileRow = h - 1 - y
      var x = 0
      while (x < w) {
        val o = offset + fileRow * rowSize + x * 3
        sb += b(o) & 0xff; sg += b(o + 1) & 0xff; sr += b(o + 2) & 0xff
        x += 1
      }
      y += 1
    }
    ImageMeta(id, "bmp", w, h, sr, sg, sb, ok = true)
  }

  final case class ThumbPixel(doc_id: Long, tx: Int, ty: Int,
      r: Int, g: Int, b: Int)

  /** Nearest-neighbor RESIZE to a side×side thumbnail — the multimodal
    * resize stage: thumbnail sample (tx, ty) is source pixel
    * (tx·w div side, ty·h div side) of the LOGICAL top-down RGB plane,
    * identical for both formats (the BMP path maps padded bottom-up BGR
    * rows back to logical pixels). Integer index arithmetic only, so a
    * SQL oracle replays every sampled byte in closed form. Corrupt or
    * non-image blobs yield an empty list (never throw) — same contract
    * as [[decode]]. Output size is FIXED (side² pixels) whatever the
    * source dims: the bounded-feature property a training pipeline needs
    * from a resize. */
  def thumbnail(id: Long, bytes: Array[Byte], side: Int): Seq[ThumbPixel] = {
    if (bytes == null || bytes.length < 2 || side <= 0) Nil
    else if (bytes(0) == 'P'.toByte && bytes(1) == '6'.toByte) {
      val hd = parsePpmHeader(bytes)
      if (hd == null) Nil
      else {
        val w = hd(0); val off = hd(2)
        // logical pixel accessor (x, y, channel 0=R/1=G/2=B)
        thumbOf(id, side, w, hd(1),
          (x, y, c) => bytes(off + (y * w + x) * 3 + c) & 0xff)
      }
    } else if (bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) {
      val hd = parseBmpHeader(bytes)
      if (hd == null) Nil
      else {
        val h = hd(1); val off = hd(2); val rowSize = hd(3)
        // BGR bottom-up → logical RGB top-down
        thumbOf(id, side, hd(0), h,
          (x, y, c) => bytes(off + (h - 1 - y) * rowSize + x * 3 + (2 - c)) & 0xff)
      }
    } else Nil
  }

  private def thumbOf(id: Long, side: Int, w: Int, h: Int,
      px: (Int, Int, Int) => Int): Seq[ThumbPixel] =
    for {
      ty <- 0 until side
      tx <- 0 until side
      sx = tx * w / side
      sy = ty * h / side
    } yield ThumbPixel(id, tx, ty, px(sx, sy, 0), px(sx, sy, 1), px(sx, sy, 2))

  // ---- Spark plumbing ----

  /** Deterministic fixture plant over the documents table: image dims
    * derive from doc_id (w = 4 + id mod 13, h = 3 + id mod 7), pixel
    * byte i = (id·31 + i) mod 256, even ids encode as PPM / odd as BMP,
    * and every id ≡ 0 (mod 17) is TRUNCATED mid-payload (the corrupt-
    * blob path). One row per document: (doc_id, blob binary). */
  def plantImages(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (4 + id % 13).toInt
        val h = (3 + id % 7).toInt
        val px = (i: Int) => ((id * 31 + i) % 256).toInt
        val full = if (id % 2 == 0) encodePpm(w, h, px) else encodeBmp(w, h, px)
        val blob = if (id % 17 == 0) full.take(full.length - (w * h * 3) / 2)
          else full
        (id, blob)
      }
    }.toDF("doc_id", "blob")
  }

  /** Per-partition nearest-neighbor resize over (idCol long, blobCol
    * binary): side² thumbnail pixels per decodable image, nothing for
    * corrupt blobs — same batch shape as [[extractImageMeta]]. */
  def extractThumbnails(df: DataFrame, idCol: String, blobCol: String,
      side: Int): Dataset[ThumbPixel] = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        thumbnail(r.getLong(idIdx),
          if (r.isNullAt(blobIdx)) null else r.getAs[Array[Byte]](blobIdx),
          side)
      }
    }
  }

  /** Per-partition real decode over (idCol long, blobCol binary):
    * mapPartitions so a heavier codec's init cost amortizes across the
    * batch of rows — never a per-row UDF. */
  def extractImageMeta(df: DataFrame, idCol: String, blobCol: String): Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows: Iterator[Row] =>
      // per-partition init of a heavier codec would go here
      rows.map { r =>
        decode(r.getLong(idIdx),
          if (r.isNullAt(blobIdx)) null else r.getAs[Array[Byte]](blobIdx))
      }
    }
  }
}
