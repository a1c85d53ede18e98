package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary induction — the
  * tokenizer-training half of the text pipeline (the BPE-ish token
  * COUNTING query q_bpe_tokens consumes a fixed segmentation; this
  * learns the merges).
  *
  * Classic Sennrich BPE over a word-frequency table: each round counts
  * adjacent symbol pairs weighted by word frequency, merges the most
  * frequent pair (deterministic tie-break: count desc, then pair
  * lexicographic), and rewrites every word's symbol sequence greedily
  * left-to-right.
  *
  * Scale notes: the ONLY distributed work is aggregating the raw corpus
  * down to the (word, cnt) frequency table (wordCounts — at 100 TB that
  * is the step that makes tokenizer training tractable, exactly as in
  * production BPE trainers) and the encode pass that applies the learned
  * merges back over the corpus. The merge LOOP itself runs on the driver
  * over the collected vocab-sized table: a vocabulary is millions of
  * rows at any corpus size, and a real 32k-merge vocab as one Spark job
  * per round (the round-3 form) would be 32k jobs over a lineage-growing
  * dataset — O(rounds²) recomputation and unusable. One collect, local
  * loop, distributed encode: the shape every production BPE trainer
  * (Sennrich's learn_bpe, SentencePiece) uses.
  */
object BpeTrainer {

  final case class BpeModel(merges: Seq[(String, String)])

  /** (word, cnt) frequency table from a text column. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Initial symbol segmentation: one symbol per Unicode CODEPOINT.
    * (`split("(?!^)")` would split between UTF-16 code units, leaving
    * lone surrogates as symbols for supplementary-plane text — Sennrich's
    * reference segments Python strings, i.e. codepoints.) Identical for
    * ASCII/BMP, where every codepoint is one char. */
  private[operators] def symbols(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var ci = 0
    var i = 0
    while (ci < w.length) {
      val n = Character.charCount(w.codePointAt(ci))
      out(i) = w.substring(ci, ci + n)
      i += 1
      ci += n
    }
    out
  }

  /** Greedy left-to-right single-pair merge (the BPE apply step). */
  def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.toSeq
  }

  /** UTF-8 byte comparison (unsigned), i.e. codepoint order — the SAME
    * total order as Spark's UTF8String binary ordering that the round-3
    * distributed form's `orderBy` used. Java's natural String ordering
    * (UTF-16 code-unit order) disagrees with it for supplementary-plane
    * symbols, so the tie-break comparator is pinned to bytes explicitly. */
  private[operators] def utf8Compare(x: String, y: String): Int = {
    val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(xb.length, yb.length)
    var i = 0
    while (i < n) {
      val c = (xb(i) & 0xff) - (yb(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    xb.length - yb.length
  }

  private def pairLt(p: (String, String), q: (String, String)): Boolean = {
    val c = utf8Compare(p._1, q._1)
    c < 0 || (c == 0 && utf8Compare(p._2, q._2) < 0)
  }

  /** Train `rounds` merges over a (word, cnt) table. Stops early when no
    * adjacent pair occurs at least `minCount` times.
    *
    * The (already-aggregated, vocab-sized) table is collected ONCE; every
    * merge round then runs locally — pair counting, argmax (count desc,
    * then pair lexicographic in UTF-8 BYTE order = codepoint order — the
    * Sennrich tie-break BpeTrainerSpec pins against its reference
    * implementation), greedy rewrite. rounds no longer costs Spark jobs:
    * a 32k-merge vocabulary trains in driver memory while the
    * corpus-sized work (wordCounts before, encode after) stays
    * distributed.
    *
    * Driver memory is BOUNDED: the collect is capped at the `maxVocab`
    * highest-count words (deterministic tie-break: cnt desc, then word in
    * UTF8 binary order), taken as a distributed top-k
    * (TakeOrderedAndProject — per-partition top-k, never a full sort or
    * full collect). A 100 TB web corpus has a distinct-"word" table in
    * the hundreds of millions (noise, URLs, code); production trainers
    * cap exactly here. When the cap does not bind (vocab ≤ maxVocab) the
    * merge sequence is IDENTICAL to the uncapped train; when it binds,
    * merges are exact BPE over the frequency-truncated vocabulary — the
    * dropped tail is the lowest-count words, whose pair mass is the least
    * able to move an argmax (BpeTrainerSpec pins both contracts). */
  def train(words: DataFrame, rounds: Int, minCount: Long = 2L,
      maxVocab: Int = 1 << 20): BpeModel = {
    val vocab: Array[(Long, Array[String])] = words
      .select(col("cnt").cast("long").as("cnt"), col("word"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getLong(0), symbols(r.getString(1))))
    val seqs: Array[(Long, scala.collection.mutable.ArrayBuffer[String])] =
      vocab.map { case (c, s) =>
        (c, scala.collection.mutable.ArrayBuffer.from(s))
      }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      seqs.foreach { case (c, s) =>
        var i = 0
        while (i + 1 < s.length) {
          val p = (s(i), s(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      var best: ((String, String), Long) = null
      counts.foreach { case (p, c) =>
        if (best == null || c > best._2 ||
          (c == best._2 && pairLt(p, best._1))) {
          best = (p, c)
        }
      }
      if (best == null || best._2 < minCount) {
        exhausted = true
      } else {
        val (a, b) = best._1
        merges += ((a, b))
        var w = 0
        while (w < seqs.length) {
          val s = seqs(w)._2
          // in-place greedy left-to-right rewrite (mergePair's logic
          // without reallocating the untouched words)
          var i = 0
          var out = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
              s(out) = a + b; i += 2
            } else {
              s(out) = s(i); i += 1
            }
            out += 1
          }
          s.dropRightInPlace(s.length - out)
          w += 1
        }
        round += 1
      }
    }
    BpeModel(merges.toSeq)
  }

  /** Apply a trained model to one word (driver-side twin used by specs
    * and for encoding probes; the distributed apply is the same function
    * inside a typed map). */
  def encodeWord(model: BpeModel, word: String): Seq[String] = {
    var syms: Seq[String] = symbols(word).toSeq
    model.merges.foreach { case (a, b) => syms = mergePair(syms, a, b) }
    syms
  }
}
