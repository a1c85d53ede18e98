package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Every declared query must run on sf0.001 without error; every oracle
  * key must exist in queries; structurally non-empty queries must return
  * rows. Guards the driver contract between full verify runs. */
class QueriesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  // queries whose result is legitimately empty/small at sf0.001
  private val mayBeEmpty = Set(
    "q_dedup_embedding", "q_dedup_minhash_lsh", "q_anti_join",
    "q_cross_theta", "q_unique_pk_check", "q_fk_check", "q_anti_join_threshold")

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }
}
