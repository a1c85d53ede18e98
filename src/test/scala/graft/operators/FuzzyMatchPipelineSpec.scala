package graft.operators

import graft.SparkSpec

class FuzzyMatchPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "harry maguire", "h maguire", "b1"),
    (2L, "mohamed salah", "m salah", "b1"),
    (3L, "totally unknown person", "t unknown", "b2")
  ).toDF("lid", "llong", "lshort", "blk")

  private def right = Seq(
    (10L, "harry maguire", "h. maguire", "b1"), // exact on long → 100
    (11L, "mo salah", "m. salah", "b1"), // fuzzy via short pass
    (12L, "someone else entirely", "s else", "b2")
  ).toDF("rid", "rlong", "rshort", "blk")

  test("exact short-circuit, two-pass greatest, threshold, top-1") {
    val out = FuzzyMatchPipeline.bestMatches(
      left, right, "lid", "rid", "llong", "rlong", "lshort", "rshort",
      blockCol = Some("blk"), threshold = 60.0)
      .orderBy("lid").collect()
    val byId = out.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byId(1L) === ((10L, 100.0))) // exact long name
    assert(byId(2L)._1 === 11L) // matched via fuzzy passes
    assert(byId(2L)._2 > 60.0 && byId(2L)._2 <= 100.0)
    assert(!byId.contains(3L)) // below threshold in its block
  }

  test("incremental: already-matched left ids are skipped before scoring") {
    val already = Seq(1L).toDF("lid")
    val out = FuzzyMatchPipeline.bestMatches(
      left, right, "lid", "rid", "llong", "rlong", "lshort", "rshort",
      blockCol = Some("blk"), threshold = 60.0, already = Some(already))
    assert(out.filter($"lid" === 1L).count() === 0)
    assert(out.filter($"lid" === 2L).count() === 1)
  }

  test("scoring runs through the native expression — no ScalaUDF in the plan") {
    val out = FuzzyMatchPipeline.bestMatches(
      left, right, "lid", "rid", "llong", "rlong", "lshort", "rshort",
      blockCol = Some("blk"), threshold = 60.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"pipeline must score via graft_token_set_ratio, not a UDF:\n$plan")
    assert(plan.contains("graft_token_set_ratio"), s"native expr missing:\n$plan")
    // identical scores to the UDF kernel path on the same pairs
    val udfScore = graft.functions.FuzzyMatch.tokenSetRatio("mohamed salah", "mo salah")
      .max(graft.functions.FuzzyMatch.tokenSetRatio("m salah", "m. salah"))
    val got = out.filter($"lid" === 2L).collect().head.getDouble(2)
    assert(math.abs(got - BigDecimal(udfScore).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("declared q_fuzzy_match equals an independent driver-side recomputation") {
    // q_fuzzy_match now ALSO has a full DuckDB oracle (round 6); this spec
    // keeps the third, independent check — the WHOLE declared query,
    // blocking + scoring + threshold + top-1, against a from-scratch
    // reimplementation over the raw-string UDF kernel (itself verified
    // against published rapidfuzz vectors in FuzzyMatchSpec). The declared
    // query thresholds/ranks on 6-dp rounded scores; mirror that here.
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.queries.FuzzyQueries.queries("q_fuzzy_match")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val cust = graft.Tables(spark, sf("sf0.001"), "customer")
      .select("c_custkey", "c_nationkey", "c_name").collect()
      .map(r => (r.getAs[Number](0).longValue(),
        r.getAs[Number](1).longValue(), r.getString(2)))
    val cands = cust.map { case (k, nk, name) =>
      (k, nk, name.toLowerCase.replace("#", " "))
    }
    val expected = cust.filter(_._1 % 100 == 0).flatMap { case (pk, pnk, _) =>
      val probeName = s"customer $pk"
      val scored = cands.filter(_._2 == pnk).map { case (ck, _, cname) =>
        val raw = if (probeName == cname) 100.0
          else graft.functions.FuzzyMatch.tokenSetRatio(probeName, cname)
        (ck, r6(raw))
      }.filter(_._2 > 55.0)
      if (scored.isEmpty) None
      else Some(pk -> scored.minBy { case (ck, s) => (-s, ck) })
    }.toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (pk, (ck, s)) =>
      assert(got(pk)._1 === ck, s"probe $pk best-cand mismatch")
      assert(math.abs(got(pk)._2 - s) < 1e-9, s"probe $pk score mismatch")
    }
  }

  test("blocking prevents cross-block matches") {
    // without blocking, lid=3 could weakly match b1 names; with blocking it
    // only sees b2 — and stays below threshold
    val out = FuzzyMatchPipeline.bestMatches(
      left, right, "lid", "rid", "llong", "rlong", "lshort", "rshort",
      blockCol = Some("blk"), threshold = 20.0)
    val m3 = out.filter($"lid" === 3L).collect()
    assert(m3.forall(_.getLong(1) === 12L))
  }
}
