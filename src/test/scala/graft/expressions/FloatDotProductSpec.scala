package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextAnalytics

class FloatDotProductSpec extends SparkSpec {
  import spark.implicits._

  test("graft_fdot equals the HOF double fold bit-for-bit on real embeddings") {
    GraftExtensions.register(spark)
    val e = Tables(spark, sf("sf0.001"), "embeddings").limit(100)
    val both = e.select(
      expr("graft_fdot(embedding, embedding)").as("native"),
      expr(TextAnalytics.dotSpark("embedding", "embedding")).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() === 0)
  }

  test("null array → null result") {
    GraftExtensions.register(spark)
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f)))
    ).toDF("a", "b")
    val out = df.select(expr("graft_fdot(a, b)").as("d")).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
  }

  test("type check rejects non-float arrays") {
    GraftExtensions.register(spark)
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    assertThrows[Exception] {
      df.select(expr("graft_fdot(a, b)")).collect()
    }
  }
}
