package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class JaccardFusionRuleSpec extends SparkSpec {

  private def naive(df: org.apache.spark.sql.DataFrame) =
    df.select(
      expr("CAST(size(array_intersect(ta, tb)) AS DOUBLE) / " +
        "CAST(size(array_union(ta, tb)) AS DOUBLE)").as("jac"))

  private def pairs = {
    val d = Tables(spark, sf("sf0.001"), "documents").limit(50)
      .select(col("doc_id"), expr("array_distinct(split(text, ' '))").as("ts"))
    d.select(col("doc_id").as("a"), col("ts").as("ta"))
      .crossJoin(d.select(col("doc_id").as("b"), col("ts").as("tb")))
      .filter(col("a") < col("b"))
  }

  test("rule fuses the naive formulation into graft_jaccard") {
    val expected = naive(pairs).collect() // without the rule
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ JaccardFusionRule
    try {
      val fusedDf = naive(pairs)
      val optimized = fusedDf.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_jaccard"), s"not fused:\n$optimized")
      assert(fusedDf.collect().map(_.getDouble(0)).toSeq ===
        expected.map(_.getDouble(0)).toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == JaccardFusionRule)
    }
  }

  test("fusion preserves results for non-distinct inputs (set-ops dedup)") {
    val df = Tables(spark, sf("sf0.001"), "documents").limit(30)
      .select(col("doc_id"), expr("split(text, ' ')").as("ts")) // duplicates kept
    val dup = df.select(col("doc_id").as("a"), col("ts").as("ta"))
      .crossJoin(df.select(col("doc_id").as("b"), col("ts").as("tb")))
      .filter(col("a") < col("b"))
    val expected = naive(dup).collect()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ JaccardFusionRule
    try {
      val fusedDf = naive(dup)
      assert(fusedDf.queryExecution.optimizedPlan.toString.contains("graft_jaccard"))
      assert(fusedDf.collect().map(_.getDouble(0)).toSeq ===
        expected.map(_.getDouble(0)).toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == JaccardFusionRule)
    }
  }

  test("mismatched intersect/union children are not fused") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ JaccardFusionRule
    try {
      val df = Tables(spark, sf("sf0.001"), "documents").limit(5)
        .select(expr("split(text, ' ')").as("ta"),
          expr("split(text, ' ')").as("tb"),
          expr("split(lang, ' ')").as("tc"))
      val p = df.select(
        expr("CAST(size(array_intersect(ta, tb)) AS DOUBLE) / " +
          "CAST(size(array_union(ta, tc)) AS DOUBLE)").as("jac"))
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("graft_jaccard"), s"unexpected fusion:\n$p")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == JaccardFusionRule)
    }
  }
}
