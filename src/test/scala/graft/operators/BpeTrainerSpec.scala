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
    // the rest is driver arithmetic — this test's wall time is the guard
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val wc = BpeTrainer.wordCounts(docs, "text")
    val local = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t0 = System.nanoTime()
    val model = BpeTrainer.train(wc, rounds = 64)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(model.merges === referenceMerges(local, rounds = 64))
    assert(model.merges.size === 64)
    assert(secs < 30.0, s"rounds=64 took ${secs}s — the per-round-job regression is back")
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
