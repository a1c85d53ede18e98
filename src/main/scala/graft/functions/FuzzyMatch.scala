package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Token-set-ratio fuzzy string similarity (SURVEY.md §2.10; ref:
  * rapidfuzz.fuzz.token_set_ratio used at etl/additional_fifa.py:113-125).
  * Implemented from the published fuzzywuzzy/rapidfuzz algorithm:
  *
  *   t0 = sorted unique common tokens
  *   t1 = t0 ++ sorted unique tokens only in a
  *   t2 = t0 ++ sorted unique tokens only in b
  *   score = max(ratio(t0,t1), ratio(t0,t2), ratio(t1,t2)) ∈ [0,100]
  *
  * where ratio is the normalized Indel similarity
  * (len1 + len2 − indel_distance) / (len1 + len2) × 100 and
  * indel_distance = len1 + len2 − 2·LCS.
  *
  * Scale notes: a deterministic scalar JVM function — registered as a UDF
  * it runs inside the executor task with no serialization beyond the
  * strings themselves. The candidate-pair generation around it (blocked
  * cross join + prune + top-1 window) is what bounds cost at scale, same
  * as the reference's batching (obsoleted by Spark partitioning, SURVEY.md
  * §4).
  */
object FuzzyMatch {

  /** Longest-common-subsequence length, O(min(n,m)) memory. */
  private def lcsLen(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val (s, t) = if (a.length < b.length) (a, b) else (b, a)
    val prev = new Array[Int](s.length + 1)
    val cur = new Array[Int](s.length + 1)
    var i = 0
    while (i < t.length) {
      var j = 0
      while (j < s.length) {
        cur(j + 1) =
          if (t.charAt(i) == s.charAt(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(s.length)
  }

  /** Normalized Indel similarity × 100 (rapidfuzz `ratio`). */
  def ratio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) return 100.0
    val dist = total - 2 * lcsLen(a, b)
    (total - dist).toDouble / total * 100.0
  }

  def tokenSetRatio(a: String, b: String): Double = {
    if (a == null || b == null) return Double.NaN
    val ta = a.split("\\s+").filter(_.nonEmpty).distinct.sorted
    val tb = b.split("\\s+").filter(_.nonEmpty).distinct.sorted
    if (ta.isEmpty && tb.isEmpty) return 100.0
    if (ta.isEmpty || tb.isEmpty) return 0.0
    val common = ta.intersect(tb)
    val restA = ta.diff(common)
    val restB = tb.diff(common)
    val t0 = common.mkString(" ")
    val t1 = (common ++ restA).mkString(" ")
    val t2 = (common ++ restB).mkString(" ")
    if (common.nonEmpty && restA.isEmpty && restB.isEmpty) 100.0
    else math.max(ratio(t0, t1), math.max(ratio(t0, t2), ratio(t1, t2)))
  }

  /** Pre-tokenized variant: inputs are already distinct-sorted token
    * arrays (e.g. `sort_array(array_distinct(split(name, ' ')))`), so the
    * per-pair cost drops to the set walk + LCS — tokenization happens once
    * per row instead of once per candidate pair. Produces exactly
    * `tokenSetRatio(a.mkString(" "), b.mkString(" "))`. */
  def tokenSetRatioSorted(taRaw: Seq[String], tbRaw: Seq[String]): Double = {
    // drop empty tokens — split-on-space keeps them, tokenSetRatio's
    // whitespace tokenizer does not
    val ta = taRaw.filter(_.nonEmpty)
    val tb = tbRaw.filter(_.nonEmpty)
    if (ta.isEmpty && tb.isEmpty) return 100.0
    if (ta.isEmpty || tb.isEmpty) return 0.0
    val sb = tb.toSet
    val common = ta.filter(sb.contains)
    val sa = common.toSet
    val restA = ta.filterNot(sa.contains)
    val restB = tb.filterNot(sa.contains)
    val t0 = common.mkString(" ")
    val t1 = (common ++ restA).mkString(" ")
    val t2 = (common ++ restB).mkString(" ")
    if (common.nonEmpty && restA.isEmpty && restB.isEmpty) 100.0
    else math.max(ratio(t0, t1), math.max(ratio(t0, t2), ratio(t1, t2)))
  }

  /** Spark UDF; null inputs → null (ref returns NaN for skip-flagged rows,
    * etl/additional_fifa.py:122-123 — null is the Spark-native encoding). */
  val tokenSetRatioUdf =
    udf((a: String, b: String) =>
      if (a == null || b == null) None else Some(tokenSetRatio(a, b)))

  val tokenSetRatioSortedUdf =
    udf((a: Seq[String], b: Seq[String]) =>
      if (a == null || b == null) None else Some(tokenSetRatioSorted(a, b)))

  def tokenSetRatioCol(a: Column, b: Column): Column = tokenSetRatioUdf(a, b)

  def tokenSetRatioSortedCol(a: Column, b: Column): Column =
    tokenSetRatioSortedUdf(a, b)
}
