package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
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
  * Scale notes: the corpus never leaves the cluster — each round is one
  * explode + one hash aggregation over the (word, count, symbols) table
  * plus a 1-row argmax to the driver, and the rewrite is a typed map.
  * At 100 TB the word-frequency table (vocabulary × count) is still
  * millions of rows, not trillions — aggregating the raw corpus down to
  * it first (wordCounts) is the step that makes tokenizer training
  * tractable, exactly as in production BPE trainers. Driver round-trips
  * = rounds (like the Lloyd build in IvfIndex).
  */
object BpeTrainer {

  final case class BpeModel(merges: Seq[(String, String)])

  /** (word, cnt) frequency table from a text column. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

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

  /** Train `rounds` merges over a (word, cnt) table. Stops early when no
    * adjacent pair occurs at least `minCount` times. */
  def train(words: DataFrame, rounds: Int, minCount: Long = 2L): BpeModel = {
    val spark = words.sparkSession
    import spark.implicits._
    // initial symbols: one per character ('(?!^)' splits between chars).
    // Spark's split keeps the trailing empty match (Java's String.split —
    // the driver-side twin — drops it), so empties are filtered out.
    var seqs: Dataset[(String, Long, Seq[String])] = words
      .select(col("word"), col("cnt").cast("long"),
        expr("filter(split(word, '(?!^)'), x -> x <> '')").as("syms"))
      .as[(String, Long, Seq[String])]
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      val top = seqs.toDF("word", "cnt", "syms")
        .select(col("cnt"), explode(expr(
          // guard: sequence(0, -1) DESCENDS in Spark, so a 1-symbol word
          // must yield an empty pair list explicitly
          """CASE WHEN size(syms) >= 2 THEN
            |  transform(sequence(0, size(syms) - 2),
            |    i -> struct(element_at(syms, i + 1) AS a,
            |                element_at(syms, i + 2) AS b))
            |ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END"""
            .stripMargin))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) {
        exhausted = true
      } else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        seqs = seqs.map { case (w, c, s) => (w, c, mergePair(s, a, b)) }
        round += 1
      }
    }
    BpeModel(merges.toSeq)
  }

  /** Apply a trained model to one word (driver-side twin used by specs
    * and for encoding probes; the distributed apply is the same function
    * inside a typed map). */
  def encodeWord(model: BpeModel, word: String): Seq[String] = {
    var syms: Seq[String] = word.split("(?!^)").toSeq
    model.merges.foreach { case (a, b) => syms = mergePair(syms, a, b) }
    syms
  }
}
