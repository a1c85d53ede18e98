package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The real image codec: encode→decode round trips for both formats,
  * format equivalence (same logical pixels → same sums), header edge
  * cases, and the never-throw corrupt-blob contract. */
class ImageCodecSpec extends SparkSpec {

  private val px = (i: Int) => (7 * i + 3) % 256

  private def expectedSums(w: Int, h: Int): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    (0 until w * h).foreach { p =>
      sr += px(3 * p); sg += px(3 * p + 1); sb += px(3 * p + 2)
    }
    (sr, sg, sb)
  }

  test("PPM P6 round trip: dims and exact channel sums") {
    val (w, h) = (13, 7)
    val m = ImageCodec.decode(1L, ImageCodec.encodePpm(w, h, px))
    val (sr, sg, sb) = expectedSums(w, h)
    assert(m === ImageCodec.ImageMeta(1L, "ppm", w, h, sr, sg, sb, ok = true))
  }

  test("BMP round trip incl. row padding: odd widths decode identically to PPM") {
    // widths 5, 6, 7 exercise all 4-byte row paddings (15, 18, 21 bytes)
    for (w <- 5 to 8; h <- Seq(3, 4)) {
      val bmp = ImageCodec.decode(2L, ImageCodec.encodeBmp(w, h, px))
      val ppm = ImageCodec.decode(2L, ImageCodec.encodePpm(w, h, px))
      assert(bmp.ok && ppm.ok, s"w=$w h=$h")
      assert((bmp.width, bmp.height, bmp.sum_r, bmp.sum_g, bmp.sum_b) ===
        ((ppm.width, ppm.height, ppm.sum_r, ppm.sum_g, ppm.sum_b)),
        s"BMP and PPM carrying the same logical pixels diverged at w=$w h=$h")
    }
  }

  test("PPM header comments and whitespace variants parse") {
    val body = (0 until 2 * 2 * 3).map(i => px(i).toByte).toArray
    val header = "P6\n# a comment\n 2 # inline\n\t2\n# one more\n255\n"
      .getBytes("US-ASCII")
    val m = ImageCodec.decode(3L, header ++ body)
    val (sr, sg, sb) = expectedSums(2, 2)
    assert(m === ImageCodec.ImageMeta(3L, "ppm", 2, 2, sr, sg, sb, ok = true))
  }

  test("corrupt payloads never throw: truncation, bad magic, bad maxval, bad bpp") {
    val full = ImageCodec.encodePpm(4, 3, px)
    assert(ImageCodec.decode(4L, full.take(full.length - 5)) ===
      ImageCodec.ImageMeta(4L, "ppm", 0, 0, 0L, 0L, 0L, ok = false))
    val bmp = ImageCodec.encodeBmp(4, 3, px)
    assert(ImageCodec.decode(5L, bmp.take(bmp.length - 5)).ok === false)
    assert(ImageCodec.decode(6L, "XY whatever".getBytes).fmt === "unknown")
    assert(ImageCodec.decode(7L, null).ok === false)
    assert(ImageCodec.decode(8L, Array[Byte]('P', '6')).ok === false)
    val maxval1023 = "P6\n2 2\n1023\n".getBytes("US-ASCII") ++
      Array.fill[Byte](24)(1)
    assert(ImageCodec.decode(9L, maxval1023).ok === false)
    // 8 bpp BMP (unsupported depth) must flag, not misread
    val bad = ImageCodec.encodeBmp(4, 3, px)
    bad(28) = 8
    assert(ImageCodec.decode(10L, bad).ok === false)
  }

  test("thumbnail: nearest-neighbor samples, format-identical, empty on corrupt") {
    val (w, h) = (10, 6)
    val ppm = ImageCodec.thumbnail(1L, ImageCodec.encodePpm(w, h, px), 4)
    val bmp = ImageCodec.thumbnail(1L, ImageCodec.encodeBmp(w, h, px), 4)
    assert(ppm.length === 16)
    // both formats carry the same logical pixels → identical thumbnails
    assert(ppm === bmp)
    ppm.foreach { t =>
      val base = ((t.ty * h / 4) * w + (t.tx * w / 4)) * 3
      assert((t.r, t.g, t.b) === ((px(base), px(base + 1), px(base + 2))),
        s"tx=${t.tx} ty=${t.ty}")
    }
    // source smaller than the thumbnail side: rows duplicate, never crash
    val tiny = ImageCodec.thumbnail(2L, ImageCodec.encodePpm(2, 2, px), 4)
    assert(tiny.length === 16)
    val full = ImageCodec.encodePpm(w, h, px)
    assert(ImageCodec.thumbnail(3L, full.take(full.length - 5), 4) === Nil)
    assert(ImageCodec.thumbnail(4L, null, 4) === Nil)
    assert(ImageCodec.thumbnail(5L, "no magic".getBytes, 4) === Nil)
  }

  test("planted fixtures decode end-to-end over the documents table") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val metas = ImageCodec.extractImageMeta(
      ImageCodec.plantImages(docs), "doc_id", "blob").collect()
    assert(metas.length === docs.count())
    metas.foreach { m =>
      if (m.doc_id % 17 == 0) {
        assert(!m.ok && m.width === 0 && m.sum_r === 0L, s"corrupt ${m.doc_id}")
        assert(m.fmt === (if (m.doc_id % 2 == 0) "ppm" else "bmp"))
      } else {
        assert(m.ok, s"doc ${m.doc_id}")
        assert(m.fmt === (if (m.doc_id % 2 == 0) "ppm" else "bmp"))
        assert(m.width === (4 + m.doc_id % 13).toInt)
        assert(m.height === (3 + m.doc_id % 7).toInt)
        // closed-form channel sums, the oracle's formula
        val wh = m.width * m.height
        var sr = 0L
        (0 until wh).foreach(p => sr += (m.doc_id * 31 + 3 * p) % 256)
        assert(m.sum_r === sr, s"doc ${m.doc_id}")
      }
    }
  }
}
