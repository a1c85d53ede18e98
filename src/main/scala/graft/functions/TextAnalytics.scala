package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, portable rolling hashes, shingling, MinHash, SimHash,
  * Jaccard, language-ID scoring and quality metrics.
  *
  * Everything is built from engine-portable integer arithmetic — a
  * polynomial rolling hash mod 1e9+7 over code points — so a DuckDB oracle
  * can reproduce results bit-for-bit (no reliance on Spark's xxhash64 or
  * DuckDB's hash(), which differ). Each primitive has a Spark renderer
  * (`*Spark`, used via expr) and a DuckDB renderer (`*Duck`, used by the
  * oracle SQL): the pair is kept adjacent so divergence is reviewable.
  *
  * Scale notes: all primitives are per-row higher-order-function
  * expressions — no shuffle, no UDF serialization, distributed trivially.
  * MinHash banding (see DedupQueries) turns near-dup search into an
  * equi-join on band keys: the only shuffle is on those keys, and the
  * band-size/row count trade-off is the standard LSH S-curve tuning.
  */
object TextAnalytics {

  /** Rolling-hash modulus (fits products in 64-bit: acc<P, acc*31+127 ≪ 2^63). */
  val P = 1000000007L

  /** MinHash modulus 2^31-1; a_i·x with x<P stays well inside 64-bit. */
  val PM = 2147483647L

  def minhashA(i: Int): Long = 1007L * i + 31L
  def minhashB(i: Int): Long = 2003L * i + 7L

  // ---- tokenization -------------------------------------------------

  def tokensSpark(text: String): String = s"split($text, ' ')"
  def tokensDuck(text: String): String = s"string_split($text, ' ')"

  // ---- polynomial rolling hash over characters ----------------------

  def charHashSpark(s: String): String =
    s"aggregate(split($s, ''), CAST(0 AS BIGINT), (a, c) -> (a * 31 + ascii(c)) % $P)"

  def charHashDuck(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, c) -> (a * 31 + c) % $P)"

  /** Per-token hashes: one char-level fold per token. */
  def tokenHashesSpark(text: String): String =
    s"transform(${tokensSpark(text)}, t -> ${charHashSpark("t")})"

  def tokenHashesDuck(text: String): String =
    s"list_transform(${tokensDuck(text)}, t -> ${charHashDuck("t")})"

  // ---- 3-token shingles (fingerprints from token hashes) ------------

  /** Shingle fingerprint combines 3 consecutive token hashes; cheaper than
    * re-hashing shingle strings and identical across engines. `th` must be
    * a column/expression of ARRAY<BIGINT>. */
  def shingleHashesSpark(th: String): String =
    s"CASE WHEN size($th) >= 3 THEN " +
      s"transform(sequence(1, size($th) - 2), i -> " +
      s"((element_at($th, i) * 31 + element_at($th, i + 1)) % $P * 31 + element_at($th, i + 2)) % $P) " +
      s"ELSE CAST(array() AS ARRAY<BIGINT>) END"

  def shingleHashesDuck(th: String): String =
    s"CASE WHEN len($th) >= 3 THEN " +
      s"list_transform(generate_series(1, len($th) - 2), i -> " +
      s"(($th[i] * 31 + $th[i + 1]) % $P * 31 + $th[i + 2]) % $P) " +
      s"ELSE [] END"

  /** Generalized k-token window hashes over a token-hash array `th` —
    * the k-ary form of the 3-shingle fingerprint (k=2 drives the
    * bigram-repetition quality rule, k=8 the decontamination grams).
    * Left fold with init 0 ≡ the shingle polynomial for k=3. */
  def gramHashesSpark(th: String, k: Int): String =
    s"CASE WHEN size($th) >= $k THEN " +
      s"transform(sequence(1, size($th) - ${k - 1}), i -> " +
      s"aggregate(slice($th, i, $k), CAST(0 AS BIGINT), (a, x) -> (a * 31 + x) % $P)) " +
      s"ELSE CAST(array() AS ARRAY<BIGINT>) END"

  def gramHashesDuck(th: String, k: Int): String =
    s"CASE WHEN len($th) >= $k THEN " +
      s"list_transform(generate_series(1, len($th) - ${k - 1}), i -> " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $th[i:i+${k - 1}]), " +
      s"(a, x) -> (a * 31 + x) % $P)) " +
      s"ELSE [] END"

  // ---- MinHash ------------------------------------------------------

  /** i-th MinHash over a shingle-fingerprint array (null for <3 tokens). */
  def minhashSpark(sh: String, i: Int): String =
    s"array_min(transform($sh, x -> (${minhashA(i)} * x + ${minhashB(i)}) % $PM))"

  def minhashDuck(sh: String, i: Int): String =
    s"list_min(list_transform($sh, x -> (${minhashA(i)} * x + ${minhashB(i)}) % $PM))"

  // ---- SimHash (16-bit, unweighted token votes) ---------------------

  def simhash16Spark(th: String): String =
    s"aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, b) -> acc + " +
      s"(CASE WHEN 2 * size(filter($th, x -> (shiftright(x, b) & 1) = 1)) > size($th) " +
      s"THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END))"

  def simhash16Duck(th: String): String =
    s"CAST(list_sum(list_transform(generate_series(0, 15), b -> " +
      s"CASE WHEN 2 * len(list_filter($th, x -> ((x >> b) & 1) = 1)) > len($th) " +
      s"THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT)"

  // ---- SimHash (60-bit; salted-parity votes — see TokenSimHash60) ----

  /** DuckDB twin of graft_simhash60: the token hash has only ~30 bits of
    * entropy (mod 1e9+7), so bit b votes the parity of an independent
    * salted remix ((x·(1007b+31) + (2003b+7)) mod (2³¹−1)) rather than a
    * raw hash bit. 60 bits keeps `1 << b` and the vote sum inside a
    * signed BIGINT on both engines. */
  def simhash60Duck(th: String): String =
    s"CAST(list_sum(list_transform(generate_series(0, 59), b -> " +
      s"CASE WHEN 2 * len(list_filter($th, x -> " +
      s"((x * (1007 * b + 31) + (2003 * b + 7)) % $PM) % 2 = 1)) > len($th) " +
      s"THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT)"

  // ---- Jaccard over distinct token sets -----------------------------

  /** `ta`/`tb` must already be distinct arrays. */
  def jaccardSpark(ta: String, tb: String): String =
    s"CAST(size(array_intersect($ta, $tb)) AS DOUBLE) / " +
      s"CAST(size(array_union($ta, $tb)) AS DOUBLE)"

  def jaccardDuck(ta: String, tb: String): String =
    s"CAST(len(list_intersect($ta, $tb)) AS DOUBLE) / " +
      s"CAST(len(list_distinct(list_cat($ta, $tb))) AS DOUBLE)"

  // ---- language-ID marker scoring -----------------------------------

  /** Marker vocabularies per language (fixed, engine-neutral). Scoring =
    * token occurrences in the marker set (duplicates count). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("window", "order", "sort", "table", "big"),
    "fr" -> Seq("query", "scan", "data", "small", "batch"),
    "es" -> Seq("dup", "slow", "agg", "merge", "stream"),
    "de" -> Seq("customer", "column", "join", "value", "vector"),
    "zh" -> Seq("the", "fast", "line", "spark", "part"))

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  def langScoreSpark(tokens: String, words: Seq[String]): String =
    s"size(filter($tokens, t -> t IN ${inList(words)}))"

  def langScoreDuck(tokens: String, words: Seq[String]): String =
    s"len(list_filter($tokens, t -> t IN ${inList(words)}))"

  /** First-wins argmax over the per-language scores s_en..s_zh (columns
    * named by `scoreCol`), deterministic under ties. Same text for both
    * engines (CASE is portable). */
  def langArgmax(scoreCol: String => String): String = {
    val langs = langMarkers.map(_._1)
    val cases = langs.map { l =>
      val geAll = langs.filterNot(_ == l)
        .map(o => s"${scoreCol(l)} >= ${scoreCol(o)}").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }
    s"CASE ${cases.mkString(" ")} END"
  }

  // ---- stopwords ----------------------------------------------------

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  // ---- double dot-product / cosine (sequential fold both engines) ---

  def dotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      s"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  def dotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($a)), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, v) -> acc + v)"

  def cosineSpark(a: String, b: String): String =
    s"${dotSpark(a, b)} / (sqrt(${dotSpark(a, a)}) * sqrt(${dotSpark(b, b)}))"

  def cosineDuck(a: String, b: String): String =
    s"${dotDuck(a, b)} / (sqrt(${dotDuck(a, a)}) * sqrt(${dotDuck(b, b)}))"
}
