package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic contracts of the late-round-7 curation/retrieval operators —
  * properties the cross-engine oracle cannot express because both
  * engines would share the same bug: DSIR must actually ENRICH the
  * target domain, hard negatives must actually be non-gold, SemDeDup's
  * keep flag must be exactly the zero-dup-partner predicate, and the
  * exact AUC must land above chance for a real signal.
  */
class CurationSemanticsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q_dsir_select enriches the target domain (src0 over-represented)") {
    val sel = graft.SparkEntry.queries("q_dsir_select")(spark, dir)
      .join(graft.Tables(spark, dir, "documents").select(col("doc_id"), col("source")),
        Seq("doc_id"))
    val rates = sel.groupBy(col("source") === "src0")
      .agg(avg(col("selected").cast("double")).as("rate"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // DSIR's whole point: docs n-gram-similar to the target sample get
    // selected at a higher rate than the rest of the corpus
    assert(rates(true) > rates(false),
      s"src0 selection rate ${rates(true)} not above rest ${rates(false)}")
    // and the selection hits the k = n/5 budget exactly
    val n = sel.count()
    assert(sel.filter(col("selected")).count() === n / 5)
  }

  test("q_hard_negatives returns only non-gold candidates") {
    val meta = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"))
    val neg = graft.SparkEntry.queries("q_hard_negatives")(spark, dir)
      .join(meta.select(col("doc_id").as("query_id"),
        col("lang").as("qlang"), col("source").as("qsource")), Seq("query_id"))
      .join(meta.select(col("doc_id").as("cand_id"),
        col("lang").as("clang"), col("source").as("csource")), Seq("cand_id"))
    assert(neg.count() > 0)
    val golds = neg.filter(col("qlang") === col("clang") &&
      col("qsource") === col("csource")).count()
    assert(golds === 0L, s"$golds gold candidates leaked into the negatives")
  }

  test("q_semdedup: earlier-dup counts match an independent recomputation from raw vectors") {
    // NOT a replay of the query's own select: recompute every
    // within-cluster pairwise cosine from the RAW embeddings in plain
    // Scala (same fold order and 6-dp half-up rounding as graft_fdot +
    // r6) and re-derive each member's earlier-priority duplicate count.
    // Takes the Lloyd cluster assignment and centroid-cosine priority
    // as given (both independently oracle-checked via the q_ann_ivf
    // Lloyd chain).
    def r6d(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val vecs = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val out = graft.SparkEntry.queries("q_semdedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))
    for (members <- out.groupBy(_._2).values) {
      for ((vid, _, csim, nDup, keep) <- members) {
        val expected = members.count { case (oid, _, ocsim, _, _) =>
          oid != vid &&
            (ocsim < csim || (ocsim == csim && oid < vid)) && {
              val (a, b) = (vecs(vid), vecs(oid))
              r6d(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))) >= 0.35
            }
        }
        assert(nDup === expected.toLong,
          s"vec $vid: n_dup_earlier=$nDup, independent recount=$expected")
        assert(keep === (expected == 0), s"keep flag wrong on vec $vid")
      }
    }
    val kept = out.count(_._5)
    assert(kept > 0 && kept < out.length,
      s"degenerate keep set $kept of ${out.length} (threshold mis-tuned?)")
  }

  test("q_auc_exact: centroid score separates label 0 well above chance") {
    val r = graft.SparkEntry.queries("q_auc_exact")(spark, dir).head()
    val (npos, nneg, u2, auc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(npos > 0 && nneg > 0)
    // exact identity: auc = u2 / (2·npos·nneg) at 6 dp
    assert(math.abs(auc - u2.toDouble / (2.0 * npos * nneg)) < 1e-6)
    assert(auc > 0.6, s"AUC $auc barely above chance — signal lost")
  }
}
