package graft.operators

import graft.{SparkSpec, Tables}

/** The distributed BPE trainer must reproduce the classic single-machine
  * Sennrich algorithm exactly: same merge sequence, same tie-breaks. */
class BpeTrainerSpec extends SparkSpec {

  /** Reference implementation on a plain Scala word-count map. */
  private def referenceMerges(words: Map[String, Long], rounds: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    var seqs: Map[String, (Long, Seq[String])] =
      words.map { case (w, c) => w -> (c, w.split("(?!^)").toSeq) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var done = false
    while (round < rounds && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      seqs.values.foreach { case (c, s) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) done = true
      else {
        // count desc, then pair lexicographic — the trainer's tie-break
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        if (c < minCount) done = true
        else {
          merges += ((a, b))
          seqs = seqs.map { case (w, (cnt, s)) =>
            w -> (cnt, BpeTrainer.mergePair(s, a, b))
          }
          round += 1
        }
      }
    }
    merges.toSeq
  }

  test("distributed trainer reproduces the reference merge sequence") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val wc = BpeTrainer.wordCounts(docs, "text")
    val local = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(local.size > 10)

    val model = BpeTrainer.train(wc, rounds = 8)
    val expected = referenceMerges(local, rounds = 8)
    assert(model.merges === expected)
    assert(model.merges.size === 8)
    // encoding round-trips losslessly and the learned merges actually
    // compress the vocabulary they were trained on
    val encoded = local.keys.map(w => w -> BpeTrainer.encodeWord(model, w))
    encoded.foreach { case (w, e) => assert(e.mkString("") === w) }
    val before = local.keys.map(_.length).sum
    val after = encoded.map(_._2.length).sum
    assert(after < before,
      s"8 merges should shrink total symbols: $before -> $after")
  }

  test("vocab-local loop makes deep training cheap: rounds=64 matches reference") {
    // round 3 ran one Spark job per merge round (64 rounds = 64 jobs on a
    // lineage-growing dataset); the vocab-local loop pays ONE collect and
    // the rest is driver arithmetic — a Spark JOB COUNT listener is the
    // guard (wall-clock assertions flake under CI contention)
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val wc = BpeTrainer.wordCounts(docs, "text")
    val local = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val counter = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(counter)
    try {
      val model = BpeTrainer.train(wc, rounds = 64)
      assert(model.merges === referenceMerges(local, rounds = 64))
      assert(model.merges.size === 64)
    } finally {
      spark.sparkContext.removeSparkListener(counter)
    }
    // the one capped top-k collect is a handful of jobs (AQE may split);
    // the per-round-job regression would be >= 64
    assert(jobs.get() <= 8,
      s"rounds=64 launched ${jobs.get()} Spark jobs — the per-round-job regression is back")
  }

  test("maxVocab cap: non-binding cap leaves the merge sequence identical") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val wc = BpeTrainer.wordCounts(docs, "text")
    val n = wc.count().toInt
    val uncapped = BpeTrainer.train(wc, rounds = 8)
    val exact = BpeTrainer.train(wc, rounds = 8, maxVocab = n)
    assert(exact.merges === uncapped.merges,
      "a cap equal to the vocabulary size must not change training")
  }

  test("maxVocab cap: binding cap = exact BPE over the count-truncated vocabulary") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val wc = BpeTrainer.wordCounts(docs, "text")
    val local = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keep = local.size / 2
    assert(keep > 10)
    // the cap's contract: keep the `keep` highest-count words, ties by
    // word ascending (UTF8 binary order — ASCII here, so String order)
    val kept = local.toSeq.sortBy { case (w, c) => (-c, w) }.take(keep).toMap
    val model = BpeTrainer.train(wc, rounds = 8, maxVocab = keep)
    assert(model.merges === referenceMerges(kept, rounds = 8),
      "a binding cap must train exact BPE over the truncated vocabulary")
  }

  test("argmax tie-break is UTF-8 byte order (codepoint order), not UTF-16") {
    // U+FF61 sorts BEFORE U+10000 by codepoint/UTF-8 bytes, but AFTER it
    // by Java's UTF-16 code-unit order (0xFF61 > 0xD800 surrogate lead)
    assert(BpeTrainer.utf8Compare("｡", new String(Character.toChars(0x10000))) < 0)
    assert("｡".compareTo(new String(Character.toChars(0x10000))) > 0)
    val sup = new String(Character.toChars(0x10000)) // U+10000
    val hw = "｡"                                // U+FF61
    import spark.implicits._
    val wc = Seq((sup + sup, 2L), (hw + hw, 2L)).toDF("word", "cnt")
    val model = BpeTrainer.train(wc, rounds = 1)
    // both pairs tie at count 2; codepoint order must pick (U+FF61, U+FF61)
    assert(model.merges === Seq((hw, hw)))
  }

  test("mergePair is greedy left-to-right and skips after a merge") {
    assert(BpeTrainer.mergePair(Seq("a", "a", "a"), "a", "a") ===
      Seq("aa", "a"))
    assert(BpeTrainer.mergePair(Seq("a", "b", "a", "b"), "a", "b") ===
      Seq("ab", "ab"))
    assert(BpeTrainer.mergePair(Seq("x"), "a", "b") === Seq("x"))
    assert(BpeTrainer.mergePair(Seq.empty, "a", "b") === Seq.empty)
  }
}
