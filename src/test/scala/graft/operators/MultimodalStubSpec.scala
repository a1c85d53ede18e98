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
}
