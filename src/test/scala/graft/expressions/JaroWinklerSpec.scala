package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerExpr.jaroWinkler(a, b)

  test("published vectors (Winkler 1990 / common test set, DuckDB-aligned)") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    assert(math.abs(jw("duane", "dwayne") - 0.8400000000000001) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("ab", "ba") === 0.0) // window 0: no cross-position match
    assert(jw("", "") === 0.0) // DuckDB convention: both-empty is 0
    assert(jw("a", "") === 0.0)
  }

  test("laws: symmetry, bounds, boost only above 0.7") {
    val samples = Seq("customer 100", "customer 1#00", "spark", "sprak",
      "crate", "trace", "a", "zz")
    for (a <- samples; b <- samples) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"($a, $b)")
      assert(math.abs(s - jw(b, a)) < 1e-12, s"asymmetric ($a, $b)")
    }
    // crate/trace: jaro ~0.733 > 0.7 but zero common prefix → no boost
    assert(math.abs(jw("crate", "trace") - JaroWinklerExpr.jaro("crate", "trace")) < 1e-12)
  }

  test("expression is codegen (no ScalaUDF in the plan) and matches the kernel") {
    GraftExtensions.register(spark)
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"))
      .toDF("a", "b")
      .select(col("a"), col("b"), expr("graft_jaro_winkler(a, b)").as("jw"))
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(2) - jw(r.getString(0), r.getString(1))) < 1e-12)
    }
  }
}
