package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins the scale-design properties of the banded sketch family:
  *
  *  - `graft_rpsig(emb, n)` parametrized planes match the HOF fold
  *    (so the adaptive-r banded queries stay oracle-reproducible);
  *  - the Manku block-permutation SimHash join (6 blocks × 10 bits,
  *    C(6,3) = 20 tables keyed on 3-block 30-bit subsets) has EXACT
  *    recall for hamming ≤ 3 (pigeonhole: ≤3 bit errors dirty ≤3 blocks,
  *    leaving some 3-block table clean) — the property that lets
  *    q_simhash_pairs replace an n² scan without missing a pair, now
  *    with 2³⁰ buckets per table instead of the round-3 2¹⁵.
  */
class SimHashBandingSpec extends SparkSpec {

  private def hofSig(emb: String, planes: Int): String = {
    def weight(j: String, d: String) =
      s"CASE WHEN (($j * 131071 + $d * 524287 + 17) % 1000003) % 2 = 0 THEN 1.0 ELSE -1.0 END"
    s"aggregate(sequence(0, ${planes - 1}), CAST(0 AS BIGINT), (acc, j) -> acc + " +
      s"(CASE WHEN aggregate(sequence(1, size($emb)), CAST(0 AS DOUBLE), " +
      s"(s, d) -> s + ${weight("j", "(d - 1)")} * CAST(element_at($emb, d) AS DOUBLE)) >= 0 " +
      s"THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END))"
  }

  test("graft_rpsig(emb, planes) matches the HOF fold at 20 and 32 planes") {
    GraftExtensions.register(spark)
    val e = Tables(spark, sf("sf0.001"), "embeddings")
    Seq(20, 32).foreach { p =>
      val both = e.select(
        expr(s"graft_rpsig(embedding, $p)").as("native"),
        expr(hofSig("embedding", p)).as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() === 0, s"planes=$p")
    }
    // wider signatures refine narrower ones: low 8 bits of the 32-plane
    // signature are exactly the 8-plane signature (same weight family)
    val refine = e.select(
      expr("graft_rpsig(embedding)").as("s8"),
      expr("graft_rpsig(embedding, 32)").as("s32"))
    assert(refine.filter(col("s8") =!= col("s32").bitwiseAND(lit(255L))).count() === 0)
  }

  test("manku 20-table simhash join recalls every hamming<=3 pair exactly") {
    GraftExtensions.register(spark)
    val sig = Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), expr("graft_simhash60(text)").as("sh"))
    // brute-force truth: all pairs with hamming <= 3 (500 docs -> 125k pairs)
    val a = sig.select(col("doc_id").as("ida"), col("sh").as("sa"))
    val b = sig.select(col("doc_id").as("idb"), col("sh").as("sb"))
    val truth = a.crossJoin(b).filter(col("ida") < col("idb"))
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select(col("ida"), col("idb"))
    // banded candidates (the q_simhash_pairs shape): 6 blocks of 10 bits,
    // one table per 3-block subset, 30-bit keys
    val combos = (0 until 6).combinations(3).toSeq.map(_.toSeq).zipWithIndex
    val bandCols = combos.map { case (cs, tId) =>
      val key = cs.zipWithIndex.map { case (c, pos) =>
        shiftright(col("sh"), c * 10).bitwiseAND(lit(1023L)) *
          lit(1L << ((2 - pos) * 10))
      }.reduce(_ + _)
      struct(lit(tId).as("band"), key.as("bkey"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
      .distinct()
    // every truth pair must appear among the candidates (recall == 1.0)
    assert(truth.join(cands, Seq("ida", "idb"), "left_anti").count() === 0)
    // and the 30-bit keys must be live past the old 15-bit range
    val maxKey = bands.select(max(col("bkey"))).head().getLong(0)
    assert(maxKey >= (1L << 15), s"max table key $maxKey never left 15 bits")
  }

  test("simhash60 uses the full 60-bit range (no dead high bits)") {
    GraftExtensions.register(spark)
    val sig = Tables(spark, sf("sf0.001"), "documents")
      .select(expr("graft_simhash60(text)").as("sh"))
    // the raw token hash has ~30 bits of entropy; the salted remix must
    // populate the high bits too, else the wide bands are degenerate
    val highBits = sig
      .select(shiftright(col("sh"), 30).as("hi")).distinct().count()
    assert(highBits > 16, s"high 30 bits only took $highBits values")
    val inRange = sig.filter(col("sh") < 0 || col("sh") >= (1L << 60)).count()
    assert(inRange === 0)
  }
}
