package graft

import org.apache.spark.sql.functions._

/** Guards on the TESTDATA.md id-space assumptions that queries bake in
  * as constants (ADVICE r6). Several dedup queries inject synthetic
  * near-duplicates at `doc_id + OFFSET` and classify membership with
  * `doc_id >= OFFSET` (100000 in q_dedup_exact, 200000 in
  * q_simhash_pairs / q_jaccard_topk_lsh, 500000 in q_dedup_incremental
  * / q_dedup_index_update). If the documents table ever grew past the
  * smallest offset, corpus docs would silently misclassify as batch and
  * injected ids could collide with real ones — and the DuckDB oracles
  * share the same constants, so cross-engine parity could NOT catch it.
  * This spec is the tripwire: it fails naming the drifted assumption
  * before any query silently degrades. (TESTDATA.md: doc_id is a dense
  * 0-based index — 5,000 rows at sf0.1.)
  */
class TestDataContractSpec extends SparkSpec {

  private val smallestInjectionOffset = 100000L

  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1"))
    test(s"$dir: max(doc_id) stays below every injection offset") {
      val mx = Tables(spark, sf(dir), "documents")
        .agg(max(col("doc_id"))).head.getLong(0)
      assert(mx < smallestInjectionOffset,
        s"documents.doc_id reaches $mx ≥ $smallestInjectionOffset: the " +
          "injected-duplicate offsets in q_dedup_exact / q_simhash_pairs / " +
          "q_jaccard_topk_lsh / q_dedup_incremental / q_dedup_index_update " +
          "(and their DuckDB oracle twins) must be raised together")
    }
}
