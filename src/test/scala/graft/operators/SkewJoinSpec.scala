package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: same result as plain join, keys spread over salts") {
    // skewed: key 1 holds 90% of rows
    val big = ((1 to 900).map(i => (1, s"v$i")) ++ (1 to 100).map(i => (i % 7 + 2, s"w$i")))
      .toDF("k", "payload")
    val small = Seq((1, "dim1"), (2, "dim2"), (3, "dim3"), (9, "dim9")).toDF("k", "name")

    val plain = big.join(small, Seq("k"), "inner")
      .groupBy("k").count().orderBy("k").collect()
    val salted = SkewJoin.saltedJoin(big, small, "k", salts = 8)
      .groupBy("k").count().orderBy("k").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("saltedJoin: left join preserves unmatched big-side rows") {
    val big = Seq((1, "a"), (2, "b"), (99, "orphan")).toDF("k", "v")
    val small = Seq((1, "dim"), (2, "dim")).toDF("k", "d")
    val out = SkewJoin.saltedJoin(big, small, "k", salts = 4, joinType = "left")
    assert(out.count() === 3)
    assert(out.filter($"k" === 99 && $"d".isNull).count() === 1)
  }

  test("keySkew: reports heavy hitters with shares") {
    val df = ((1 to 80).map(_ => 1) ++ (1 to 20).map(i => i + 1)).toDF("k")
    val top = SkewJoin.keySkew(df, "k", topN = 1).collect().head
    assert(top.getInt(0) === 1)
    assert(top.getAs[Double]("share") === 0.8)
  }
}
