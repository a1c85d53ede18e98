package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of incremental ingest dedup: every planted near-copy of a
  * corpus document is rejected with its source as the best match;
  * decisions cover exactly the batch. */
class DedupIncrementalSpec extends SparkSpec {

  test("planted near-copies are rejected against their corpus source") {
    val out = graft.SparkEntry.queries("q_dedup_incremental")(spark, sf("sf0.001"))
      .collect()
    val (injected, organic) = out.partition(_.getLong(0) >= 500000L)
    assert(injected.nonEmpty, "batch must contain planted near-copies")
    injected.foreach { r =>
      assert(r.getBoolean(1), s"planted dup ${r.getLong(0)} admitted")
      assert(r.getLong(2) === r.getLong(0) - 500000L,
        s"planted dup ${r.getLong(0)} matched ${r.getLong(2)}, not its source")
      assert(r.getDouble(3) > 0.8,
        s"planted dup ${r.getLong(0)} scored only ${r.getDouble(3)}")
    }
    // organic batch docs exist and carry a decision either way
    assert(organic.nonEmpty)
    organic.foreach(r => assert(r.getLong(0) % 10 === 0L))
    // an admitted doc has no match columns
    out.filter(!_.getBoolean(1)).foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3))
    }
  }

  test("corpus is never compared against itself: output covers exactly the batch") {
    val out = graft.SparkEntry.queries("q_dedup_incremental")(spark, sf("sf0.001"))
    val n = graft.Tables(spark, sf("sf0.001"), "documents")
    val nBatch = n.filter(col("doc_id") % 10 === 0).count()
    val nInjected = n.filter(col("doc_id") % 40 === 1).count()
    assert(out.count() === nBatch + nInjected)
  }
}
