package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.expressions.GraftExtensions

/** Pins the round-4 ceiling lift: banded hyperplane signatures carried as
  * ARRAY<LONG> (graft_rpbands) so the adaptive band width r can exceed
  * the 15 bits a single packed long allowed.
  *
  *  - For r ≤ 15 the array elements are EXACTLY the slices of the packed
  *    `graft_rpsig(emb, 4r)` signature — so every recorded band key (and
  *    query hash) from the packed era is unchanged;
  *  - for r > 15 the keys are live past bit 15 (no dead high bits) and
  *    match the HOF fold plane-for-plane;
  *  - the adaptive width keeps expected bucket occupancy ~constant
  *    (within [B/2, B]) through a sweep far past the old 16·2¹⁵
  *    saturation point — the round-3 "What's wrong #1" defect.
  */
class RpBandsSpec extends SparkSpec {

  test("rpbands elements equal packed rpsig slices for r <= 15") {
    GraftExtensions.register(spark)
    val e = Tables(spark, sf("sf0.001"), "embeddings")
    Seq(8, 15).foreach { r =>
      val mask = (1L << r) - 1
      val both = e.select(
        expr(s"graft_rpbands(embedding, 4, $r)").as("bands"),
        expr(s"graft_rpsig(embedding, ${4 * r})").as("packed"))
      val bad = both.filter(
        (0 until 4).map { b =>
          element_at(col("bands"), b + 1) =!=
            shiftright(col("packed"), b * r).bitwiseAND(lit(mask))
        }.reduce(_ || _))
      assert(bad.count() === 0, s"r=$r")
    }
  }

  test("rpbands r=18 matches the HOF fold per band and uses bits past 15") {
    GraftExtensions.register(spark)
    val r = 18
    def weight(j: String, d: String) =
      s"CASE WHEN (($j * 131071 + $d * 524287 + 17) % 1000003) % 2 = 0 THEN 1.0 ELSE -1.0 END"
    // band b's key from the HOF formulation: bit i = sign of plane b*r+i
    def hofBand(b: Int): String =
      s"aggregate(sequence(0, ${r - 1}), CAST(0 AS BIGINT), (acc, i) -> acc + " +
        s"(CASE WHEN aggregate(sequence(1, size(embedding)), CAST(0 AS DOUBLE), " +
        s"(s, d) -> s + ${weight(s"($b * $r + i)", "(d - 1)")} * " +
        s"CAST(element_at(embedding, d) AS DOUBLE)) >= 0 " +
        s"THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END))"
    val e = Tables(spark, sf("sf0.001"), "embeddings")
      .withColumn("bands", expr(s"graft_rpbands(embedding, 4, $r)"))
    val bad = e.filter(
      (0 until 4).map { b =>
        element_at(col("bands"), b + 1) =!= expr(hofBand(b))
      }.reduce(_ || _))
    assert(bad.count() === 0)
    // keys must populate bits >= 15 — the packed form could never
    val maxKey = e.select(max(element_at(col("bands"), 1))).head().getLong(0)
    assert(maxKey >= (1L << 15), s"max band key $maxKey never left the old 15-bit range")
  }

  test("rpbands null-propagates a null embedding ELEMENT (parity with the HOF fold)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Float](1.0f, -2.0f, 0.5f)),
      (2L, Seq[java.lang.Float](1.0f, null, 0.5f))
    ).toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>").as("embedding"))
      .withColumn("bands", expr("graft_rpbands(embedding, 4, 18)"))
    val rows = df.select(col("id"), col("bands").isNull.as("n"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows(1L) === false)
    assert(rows(2L) === true,
      "a null element must null the whole signature, not read as 0")
  }

  test("adaptive width keeps bucket occupancy ~constant past the 2^15 saturation point") {
    val B = 16L // targetBucket
    // sweep n across 2^10 .. 2^40 — far past 16*2^15 (~0.5M), where the
    // round-3 clamp froze r at 15 and occupancy started growing with n
    (10 to 40).foreach { k =>
      Seq((1L << k), (1L << k) + 1, (1L << k) * 3 / 2).foreach { n =>
        val r = SimilarityQueries.bandWidth(n)
        assert(r <= 62)
        if (n >= B * 16) { // below the [4,_] clamp floor occupancy is tiny
          val occ = n.toDouble / (1L << r).toDouble
          assert(occ <= B + 1e-9 && occ >= B / 2.0 - 1e-9,
            s"n=$n r=$r occupancy=$occ outside [${B / 2}, $B]")
        }
      }
    }
    // the old clamp would have pinned these at 15
    assert(SimilarityQueries.bandWidth(16L << 20) === 20)
    assert(SimilarityQueries.bandWidth(16L << 35) === 35)
  }
}
