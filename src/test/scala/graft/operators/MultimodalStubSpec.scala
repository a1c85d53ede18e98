package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.TextAnalytics

class MultimodalStubSpec extends SparkSpec {

  test("extractFeatures: partition-wise decode with typed schema") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val bin = MultimodalStub.asBinaryTable(docs)
    val feats = MultimodalStub.extractFeatures(bin, "doc_id", "blob")
    val rows = feats.orderBy("media_id").limit(5).collect()
    assert(rows.forall(_.ok))
    assert(rows.forall(r => r.n_bytes > 0))
    assert(rows.forall(r => r.width >= 1 && r.width <= 640))
    assert(feats.count() === docs.count())
  }

  test("decodeStub fingerprint equals the portable rolling char hash for ASCII") {
    // Cross-check: byte-level stub hash == TextAnalytics char hash (ASCII)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf("sf0.001"), "documents").limit(20)
    val viaExpr = docs.select($"doc_id",
      expr(TextAnalytics.charHashSpark("text")).as("fp"))
    val viaStub = MultimodalStub
      .extractFeatures(MultimodalStub.asBinaryTable(docs), "doc_id", "blob")
      .select($"media_id".as("doc_id"), $"fingerprint".as("fp2"))
    val joined = viaExpr.join(viaStub, "doc_id")
      .filter($"fp" =!= $"fp2")
    assert(joined.count() === 0)
  }

  test("decodeStub: empty payload → ok=false") {
    val f = MultimodalStub.decodeStub(7L, Array.emptyByteArray)
    assert(!f.ok && f.n_bytes === 0)
  }

  test("sampleFrames: strided fixed-size windows, one row per frame") {
    val docs = Tables(spark, sf("sf0.001"), "documents").limit(10)
    val frames = MultimodalStub.sampleFrames(
      MultimodalStub.asBinaryTable(docs), "doc_id", "blob",
      frameBytes = 32, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.n_bytes === 32))
    assert(frames.forall(f => f.offset % 64 === 0)) // stride 2 × 32 bytes
    val perDoc = frames.groupBy(_.media_id)
    assert(perDoc.values.forall(fs => fs.map(_.frame_idx).sorted.toSeq ===
      (0 until fs.length)))
  }

  test("resizeMeta: bounded max edge, aspect preserved, never upscales") {
    val f = MultimodalStub.MediaFeatures(1L, 100, 0L, 640, 480, ok = true)
    val (w, h) = MultimodalStub.resizeMeta(f, 320)
    assert(w === 320 && h === 240)
    val small = MultimodalStub.MediaFeatures(2L, 10, 0L, 64, 48, ok = true)
    assert(MultimodalStub.resizeMeta(small, 320) === ((64, 48)))
  }
}
