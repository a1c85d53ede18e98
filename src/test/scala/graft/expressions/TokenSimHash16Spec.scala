package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextAnalytics

class TokenSimHash16Spec extends SparkSpec {

  test("native simhash equals the HOF formulation on real documents") {
    GraftExtensions.register(spark)
    val d = Tables(spark, sf("sf0.001"), "documents")
      .withColumn("th", expr(TextAnalytics.tokenHashesSpark("text")))
    val both = d.select(
      expr("graft_simhash16(text)").as("native"),
      expr(TextAnalytics.simhash16Spark("th")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("graft_token_set_ratio equals the UDF kernel on real name pairs") {
    GraftExtensions.register(spark)
    import graft.functions.FuzzyMatch
    val c = Tables(spark, sf("sf0.001"), "customer").limit(40)
      .select(col("c_custkey"), lower(col("c_name")).as("n1"),
        regexp_replace(lower(col("c_name")), "#0*", " ").as("n2"))
      .withColumn("t1", sort_array(array_distinct(split(col("n1"), " "))))
      .withColumn("t2", sort_array(array_distinct(split(col("n2"), " "))))
    val rows = c.select(col("n1"), col("n2"),
      expr("graft_token_set_ratio(t1, t2)").as("native")).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) === FuzzyMatch.tokenSetRatio(r.getString(0), r.getString(1)))
    }
  }

  test("null input → null; signature fits in 16 bits") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val out = Seq(Some("a b c"), None).toDF("text")
      .select(expr("graft_simhash16(text)").as("s")).collect()
    assert(!out(0).isNullAt(0) && out(0).getLong(0) >= 0 && out(0).getLong(0) < 65536)
    assert(out(1).isNullAt(0))
  }
}
