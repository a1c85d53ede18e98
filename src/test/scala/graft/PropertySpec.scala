package graft

import org.scalacheck.Gen

import graft.functions.FuzzyMatch
import graft.quality.Checks
import graft.transform.FplTransform

/** Property-based tests (SURVEY.md §5 item 2): coercion totality, V1/V2
  * invariants under injected duplicates/nulls, union alignment, fuzzy
  * kernel laws. */
class PropertySpec extends SparkSpec {

  /** Minimal forAll over ScalaCheck generators (scalatestplus bridge is
    * not on the classpath; Gen sampling gives the same coverage). */
  private def forSamples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    val params = org.scalacheck.Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    (1 to n).foreach { _ =>
      gen.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("P4 intStr: total on all doubles incl. NaN/Inf; truncates decimals") {
    // NaN/Inf → null (pandas NaN behavior); finite → decimal-truncated string
    val vals: Seq[java.lang.Double] = Seq(
      1.0, -1.001, 43.023, 0.0, -0.9, 1e15,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, null)
    val out = vals.toDF("x")
      .select(FplTransform.intStr(col("x")).as("s"))
      .as[Option[String]].collect()
    assert(out.take(6).flatten.toSeq === Seq("1", "-1", "43", "0", "0", "1000000000000000"))
    assert(out.drop(6).forall(_.isEmpty)) // NaN, ±Inf, null → null
  }

  test("V1: duplicate injection is always detected") {
    forSamples(Gen.nonEmptyListOf(Gen.choose(0, 1000)), 10) { xs =>
      val distinct = xs.distinct
      val base = distinct.toDF("k")
      assert(Checks.isUniqueKey(base, Seq("k")))
      val withDup = (distinct :+ distinct.head).toDF("k")
      assert(!Checks.isUniqueKey(withDup, Seq("k")))
    }
  }

  test("V2: null injection in any key level is always detected") {
    forSamples(Gen.choose(1, 20), 5) { n =>
      val clean = (1 to n).map(i => (Some(i), Some(i * 2))).toDF("a", "b")
      assert(Checks.hasNoNullKeys(clean, Seq("a", "b")))
      val dirty = ((1 to n).map(i => (Some(i), Some(i * 2))) :+
        ((None: Option[Int], Some(0)))).toDF("a", "b")
      assert(!Checks.hasNoNullKeys(dirty, Seq("a", "b")))
    }
  }

  test("O5 unionByName: column order independence, missing → null") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((9.5, 2)).toDF("w", "k")
    val u = a.unionByName(b, allowMissingColumns = true)
    assert(u.columns.toSet === Set("k", "v", "w"))
    assert(u.count() === 2)
    assert(u.filter($"k" === 2 && $"v".isNull && $"w" === 9.5).count() === 1)
  }

  test("tokenSetRatio laws: symmetry, bounds, identity") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
    val sentence = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    forSamples(Gen.zip(sentence, sentence), 50) { case (a, b) =>
      val ab = FuzzyMatch.tokenSetRatio(a, b)
      assert(ab === FuzzyMatch.tokenSetRatio(b, a)) // symmetric
      assert(ab >= 0.0 && ab <= 100.0) // bounded
      assert(FuzzyMatch.tokenSetRatio(a, a) === 100.0) // identity
    }
  }

  test("ratio laws: identity and bounds") {
    forSamples(Gen.zip(Gen.alphaNumStr, Gen.alphaNumStr), 50) { case (a, b) =>
      assert(FuzzyMatch.ratio(a, a) === 100.0)
      val r = FuzzyMatch.ratio(a, b)
      assert(r >= 0.0 && r <= 100.0)
    }
  }

  test("gramHashes(k=3) reproduces the proven shingle polynomial exactly") {
    import graft.functions.TextAnalytics._
    forSamples(Gen.listOfN(12, Gen.oneOf("spark", "data", "row", "agg",
      "scan", "join", "key")), 10) { words =>
      val text = words.mkString(" ")
      val row = Seq(text).toDF("text")
        .withColumn("th", expr(tokenHashesSpark("text")))
        .select(expr(shingleHashesSpark("th")).as("sh"),
          expr(gramHashesSpark("th", 3)).as("g3"))
        .head
      assert(row.getSeq[Long](0) === row.getSeq[Long](1), text)
    }
  }

  test("gramHashes: window count law and sub-k guard, any k") {
    import graft.functions.TextAnalytics._
    forSamples(Gen.zip(Gen.choose(2, 9), Gen.choose(0, 15)), 15) { case (k, n) =>
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val got = Seq(text).toDF("text")
        .withColumn("th", expr(tokenHashesSpark("text")))
        .select(expr(gramHashesSpark("th", k)).as("g"))
        .head.getSeq[Long](0)
      val expected = if (n >= k && n > 0) n - k + 1 else 0
      assert(got.length === expected, s"k=$k n=$n")
    }
  }

  test("portable key hash: overflow-free and mod-p correct at ANY long key") {
    // The sampling/split/checksum hash reduces mod p BEFORE multiplying:
    // (p−1)·2654435761 < 2⁶³. The unreduced form exceeds Long.MAX past
    // key ≈ 3.5e9 — under ANSI mode that is a runtime ERROR, so a
    // regression here breaks every 100 TB split, not just its statistics.
    // Extremes + random longs, checked against BigInt arithmetic.
    val p = BigInt(1000000007L)
    val keys = Seq(0L, 1L, 3500000000L, Long.MaxValue - 1, Long.MaxValue) ++
      (1 to 20).map(i => math.abs(new scala.util.Random(i).nextLong()))
    val got = keys.toDF("k")
      .select(col("k"), expr("k % 1000000007 * 2654435761 % 1000000007").as("h"))
      .collect()
    got.foreach { r =>
      val (k, h) = (r.getLong(0), r.getLong(1))
      val expected = (BigInt(k) mod p) * BigInt(2654435761L) mod p
      assert(BigInt(h) === expected, s"k=$k")
      assert(h >= 0 && h < 1000000007L)
    }
  }
}
