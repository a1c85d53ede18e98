package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Kernel checks against published fuzzywuzzy/rapidfuzz behavior
  * (SURVEY.md §2.10 risk item 6). */
class FuzzyMatchSpec extends AnyFunSuite {

  test("ratio: identical strings → 100") {
    assert(FuzzyMatch.ratio("abc", "abc") === 100.0)
    assert(FuzzyMatch.ratio("", "") === 100.0)
  }

  test("ratio: published vector — trailing char") {
    // rapidfuzz: ratio("this is a test", "this is a test!") ≈ 96.5517
    val r = FuzzyMatch.ratio("this is a test", "this is a test!")
    assert(math.abs(r - 96.5517) < 0.001)
  }

  test("ratio: disjoint strings → 0") {
    assert(FuzzyMatch.ratio("abc", "xyz") === 0.0)
  }

  test("tokenSetRatio: duplicate tokens ignored (canonical fuzzywuzzy demo)") {
    assert(FuzzyMatch.tokenSetRatio("fuzzy was a bear", "fuzzy fuzzy was a bear") === 100.0)
  }

  test("tokenSetRatio: word order ignored") {
    assert(FuzzyMatch.tokenSetRatio(
      "new york mets vs atlanta braves",
      "atlanta braves vs new york mets") === 100.0)
  }

  test("tokenSetRatio: subset tokens score via intersection branch") {
    // t0 = common subset, t1 = t0 → ratio(t0, t1) = 100 when one side ⊆ other
    assert(FuzzyMatch.tokenSetRatio("a b", "a b c") === 100.0)
  }

  test("tokenSetRatio: symmetric") {
    val a = "customer 123"
    val b = "customer 000000123"
    assert(FuzzyMatch.tokenSetRatio(a, b) === FuzzyMatch.tokenSetRatio(b, a))
    assert(FuzzyMatch.tokenSetRatio(a, b) > 0.0)
    assert(FuzzyMatch.tokenSetRatio(a, b) < 100.0)
  }

  test("tokenSetRatioSorted equals tokenSetRatio on pre-tokenized input") {
    val pairs = Seq(
      ("customer 123", "customer 000000123"),
      ("new york mets vs atlanta braves", "atlanta braves vs new york mets"),
      ("a b c", "b c d"),
      ("x", "y"))
    pairs.foreach { case (a, b) =>
      def prep(s: String) = s.split(" ").distinct.sorted.toSeq
      assert(FuzzyMatch.tokenSetRatioSorted(prep(a), prep(b)) ===
        FuzzyMatch.tokenSetRatio(a, b), s"mismatch for ($a, $b)")
    }
  }

  test("tokenSetRatio: whitespace-only / empty handled") {
    assert(FuzzyMatch.tokenSetRatio("", "") === 100.0) // both empty → ratio("","")
    assert(FuzzyMatch.tokenSetRatio("abc", "") === 0.0)
  }
}
