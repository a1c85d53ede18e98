package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.{SparkSpec, Tables}

/** Pins the two properties the winnowed substring screen rests on:
  *
  *  - the O(n) rolling recurrence produces EXACTLY the per-window fold's
  *    hashes (modular subtraction is where an off-by-one would hide);
  *  - the winnowing guarantee (Schleimer et al., SIGMOD'03): documents
  *    sharing a span of ≥ win + k − 1 chars share ≥ 1 fingerprint at ANY
  *    alignment — the recall property stride sampling lacks.
  */
class WinnowingSpec extends SparkSpec {

  private val win = 64
  private val k = 16

  test("rolling stride-1 hashes equal the per-window fold on every document") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
      .select(col("text")).collect().map(_.getString(0))
    assert(docs.length > 100)
    docs.foreach { t =>
      val rolled = WindowHash.computeRolling(t, win).toSeq
      val folded = WindowHash.compute(UTF8String.fromString(t), win, 1).toSeq
      assert(rolled === folded)
    }
  }

  test("any shared span of win + k - 1 chars fingerprints at EVERY alignment") {
    val span = ("the shared boilerplate span that must always be detected " * 3)
      .take(win + k - 1)
    assert(span.length === win + k - 1)
    val base = "completely unrelated leading content of document a padded out " * 3
    val a = WinnowFingerprints.compute(base + span, win, k).toSet
    // shift the span through k+5 distinct offsets in the other document —
    // including every residue class mod k — and require a shared
    // fingerprint each time
    (0 until (k + 5)).foreach { off =>
      val b = WinnowFingerprints.compute(
        "zq" * 7 + "different prefix " + ("y" * off) + span + " trailing junk", win, k)
      assert(b.toSet.intersect(a).nonEmpty, s"offset $off missed the shared span")
    }
    // negative control: without the span, no shared fingerprints
    val c = WinnowFingerprints.compute(
      "zq" * 7 + "different prefix with no common content at all whatsoever " * 3, win, k)
    assert(c.toSet.intersect(a).isEmpty)
  }

  test("alignment recall holds at larger window/stride configs") {
    // the production knob turns win/k UP as documents grow (fewer, more
    // selective fingerprints); the guarantee must not be 64/16-specific.
    // Same sweep as above at (128, 31) and (256, 63): a span of
    // win + k − 1 chars must fingerprint at every offset residue mod k.
    Seq((128, 31), (256, 63)).foreach { case (w, kk) =>
      val span = ("the shared boilerplate span that must always be detected " * 12)
        .take(w + kk - 1)
      assert(span.length === w + kk - 1)
      val base = "completely unrelated leading content of document a padded out " * 6
      val a = WinnowFingerprints.compute(base + span, w, kk).toSet
      (0 until (kk + 5)).foreach { off =>
        val b = WinnowFingerprints.compute(
          "zq" * 7 + "different prefix " + ("y" * off) + span + " trailing junk",
          w, kk)
        assert(b.toSet.intersect(a).nonEmpty,
          s"(win=$w, k=$kk) offset $off missed the shared span")
      }
      val c = WinnowFingerprints.compute(
        "zq" * 7 + "different prefix with no common content at all whatsoever " * 6,
        w, kk)
      assert(c.toSet.intersect(a).isEmpty, s"(win=$w, k=$kk) false positive")
    }
  }

  test("graft_winnow SQL surface matches the kernel and stays distinct-sorted") {
    GraftExtensions.register(spark)
    val d = Tables(spark, sf("sf0.001"), "documents").limit(50)
    val rows = d.select(col("text"), expr(s"graft_winnow(text, $win, $k)").as("fp"))
      .collect()
    rows.foreach { r =>
      val viaSql = r.getSeq[Long](1)
      val direct = WinnowFingerprints.compute(r.getString(0), win, k).toSeq
      assert(viaSql === direct)
      assert(viaSql === viaSql.distinct.sorted)
    }
  }
}
