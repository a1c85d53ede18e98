package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class FloatRpSigSpec extends SparkSpec {

  /** HOF twin of the native expression (same text as the DuckDB oracle's
    * formulation) — parity oracle for the codegen path. */
  private def hofSig(emb: String, planes: Int = 8): String = {
    def weight(j: String, d: String) =
      s"CASE WHEN (($j * 131071 + $d * 524287 + 17) % 1000003) % 2 = 0 THEN 1.0 ELSE -1.0 END"
    s"aggregate(sequence(0, ${planes - 1}), CAST(0 AS BIGINT), (acc, j) -> acc + " +
      s"(CASE WHEN aggregate(sequence(1, size($emb)), CAST(0 AS DOUBLE), " +
      s"(s, d) -> s + ${weight("j", "(d - 1)")} * CAST(element_at($emb, d) AS DOUBLE)) >= 0 " +
      s"THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END))"
  }

  test("graft_rpsig equals the HOF signature on real embeddings") {
    GraftExtensions.register(spark)
    val e = Tables(spark, sf("sf0.001"), "embeddings")
    val both = e.select(
      expr("graft_rpsig(embedding)").as("native"),
      expr(hofSig("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // signatures should use multiple buckets (not degenerate)
    assert(e.select(expr("graft_rpsig(embedding)")).distinct().count() > 4)
  }
}
