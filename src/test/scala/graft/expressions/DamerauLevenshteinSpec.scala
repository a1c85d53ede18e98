package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DamerauLevenshteinSpec extends SparkSpec {
  import spark.implicits._

  private def dl(a: String, b: String): Int =
    DamerauLevenshteinExpr.damerau(a, b)

  test("true DL, not OSA: the CA->ABC distinguishing case is 2") {
    assert(dl("CA", "ABC") === 2) // OSA would say 3
    assert(dl("ab", "ba") === 1) // adjacent swap costs 1
    assert(dl("apple", "aplpe") === 1)
    assert(dl("teh", "the") === 1)
    assert(dl("kitten", "sitting") === 3)
    assert(dl("", "") === 0)
    assert(dl("a", "") === 1)
    assert(dl("", "abc") === 3)
    assert(dl("abc", "abc") === 0)
  }

  test("laws: symmetry, triangle inequality, identity of indiscernibles") {
    val xs = Seq("spark", "sprak", "spa", "park", "customer 100", "a", "")
    for (a <- xs; b <- xs) {
      assert(dl(a, b) === dl(b, a), s"($a, $b)")
      assert((dl(a, b) == 0) === (a == b), s"($a, $b)")
      for (c <- xs)
        assert(dl(a, c) <= dl(a, b) + dl(b, c), s"($a, $b, $c)")
    }
  }

  test("never exceeds plain levenshtein; differs exactly on swaps") {
    GraftExtensions.register(spark)
    val pairs = Seq(("ab", "ba"), ("abcd", "abdc"), ("spark", "sprak"),
      ("kitten", "sitting"), ("abc", "xyz"))
    val rows = pairs.toDF("a", "b")
      .select(expr("graft_damerau(a, b)").as("dl"),
        levenshtein(col("a"), col("b")).as("lev"))
    rows.collect().foreach { r =>
      assert(r.getInt(0) <= r.getInt(1))
    }
    assert(!rows.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }
}
