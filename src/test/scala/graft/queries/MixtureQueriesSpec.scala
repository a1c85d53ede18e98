package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the mixture-design family that the oracle hash cannot
  * express: UniMax's waterfilling laws (budget conservation, cap
  * respected, capped-set-is-a-prefix), temperature sampling's
  * low-resource boost, and materialization ≡ allocation. */
class MixtureQueriesSpec extends SparkSpec {

  private def dir = sf("sf0.001")

  test("q_unimax_alloc: caps respected, budget conserved, capped set is the small prefix") {
    val rows = graft.SparkEntry.queries("q_unimax_alloc")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val total = rows.map(_._2).sum
    val budget = 6 * total / 5
    // capped languages get exactly 1.5 epochs (fixed-point); nobody exceeds cap
    rows.foreach { case (lang, n, alloc, capped) =>
      if (capped) assert(alloc === 3 * n / 2, s"$lang capped but alloc != cap")
      else assert(alloc <= 3 * n / 2, s"$lang exceeds the epoch cap")
    }
    // budget exactly spent when any language is budget-limited,
    // under-spent only if every language hit its cap first
    val spent = rows.map(_._3).sum
    if (rows.exists(!_._4)) assert(spent === budget, "unspent budget with an uncapped language")
    else assert(spent <= budget)
    // the capped set is exactly the small-corpus prefix
    val sorted = rows.sortBy(r => (r._2, r._1))
    val firstUncapped = sorted.indexWhere(!_._4)
    if (firstUncapped >= 0)
      assert(sorted.drop(firstUncapped).forall(!_._4), "capped language above an uncapped one")
    // uncapped languages share equally (±1 from integer remainder spread)
    val unc = rows.filter(!_._4).map(_._3)
    if (unc.nonEmpty) assert(unc.max - unc.min <= 1)
  }

  test("q_temperature_mix: alpha<1 boosts low-resource shares, targets bounded by corpus") {
    val rows = graft.SparkEntry.queries("q_temperature_mix")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val total = rows.map(_._2).sum.toDouble
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "rates must sum to ~1")
    rows.foreach { case (lang, n, rate, target) =>
      assert(target <= n, s"$lang target exceeds corpus (no-replacement regime)")
      val natural = n / total
      if (natural < 1.0 / rows.length)
        assert(rate > natural, s"low-resource $lang not boosted at alpha=0.3")
      else if (natural > 1.0 / rows.length)
        assert(rate < natural, s"head $lang not damped at alpha=0.3")
    }
  }

  test("q_mix_materialize: per-language repeat mass equals the doc-count UniMax allocation") {
    val mat = graft.SparkEntry.queries("q_mix_materialize")(spark, dir)
    val perLang = mat.groupBy(col("lang"))
      .agg(sum(col("n_repeats")).as("mass"), count(lit(1)).as("n"),
        max(col("n_repeats")).as("hi"), min(col("n_repeats")).as("lo"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalDocs = perLang.map(_._3).sum
    val budget = 6 * totalDocs / 5
    val spent = perLang.map(_._2).sum
    assert(spent <= budget)
    // fractional epoch ⇒ repeats within a language differ by at most 1
    perLang.foreach { case (lang, _, _, hi, lo) =>
      assert(hi - lo <= 1, s"$lang repeat counts not an (e, e+1) split")
    }
    // every document appears exactly once in the assignment
    assert(mat.count() === graft.Tables(spark, dir, "documents").count())
  }
}
