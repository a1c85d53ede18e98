package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of keep-best canonical selection: inside every near-dup
  * cluster the survivor is the longest member (ties to the lowest
  * doc_id), singletons survive themselves, and membership partitions
  * the corpus exactly. */
class DedupKeepBestSpec extends SparkSpec {

  test("the survivor is the longest member of its cluster") {
    val kept = graft.SparkEntry.queries("q_dedup_keep_best")(spark, sf("sf0.001"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val comp = graft.SparkEntry.queries("q_dedup_components")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chars = graft.Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent recomputation: group docs by component (or self)
    val byCluster = chars.keys.groupBy(id => comp.getOrElse(id, id))
    assert(byCluster.size === kept.size)
    byCluster.foreach { case (cid, members) =>
      val (n, kd, kc) = kept(cid)
      assert(n === members.size.toLong, s"cluster $cid member count")
      val best = members.minBy(id => (-chars(id), id))
      assert(kd === best, s"cluster $cid kept $kd, longest is $best")
      assert(kc === chars(best))
    }
    // multi-member clusters exist, so the policy actually chose
    assert(byCluster.values.exists(_.size > 1))
  }

  test("survivors partition the corpus: one per cluster, clusters cover all docs") {
    val out = graft.SparkEntry.queries("q_dedup_keep_best")(spark, sf("sf0.001"))
    val nDocs = graft.Tables(spark, sf("sf0.001"), "documents").count()
    assert(out.agg(sum(col("n_members"))).head.getLong(0) === nDocs)
    assert(out.select("kept_doc").distinct().count() === out.count())
  }
}
