package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** graft_jlproj must be BIT-IDENTICAL to the nested-HOF formulation it
  * replaces (the form the DuckDB oracle mirrors) — integer accumulation
  * means there is no tolerance, any mismatch is a bug. */
class JlProjectSpec extends SparkSpec {

  private val hof =
    """transform(sequence(0, 7), j ->
      |  aggregate(sequence(0, size(embedding) - 1), 0L,
      |    (acc, i) -> acc
      |      + CAST(floor(CAST(element_at(embedding, i + 1) AS DOUBLE)
      |                   * 1000000 + 0.5) AS LONG)
      |      * (CASE WHEN (j * 256 + i) % 1000000007 * 2654435761
      |                   % 1000000007 % 2 = 0
      |          THEN 1L ELSE -1L END)))""".stripMargin

  test("graft_jlproj equals the HOF fold on every embedding") {
    GraftExtensions.register(spark)
    val emb = Tables(spark, sf("sf0.001"), "embeddings")
    val mism = emb
      .select(col("vec_id"),
        expr("graft_jlproj(embedding, 8)").as("native"),
        expr(hof).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mism === 0)
  }

  test("graft_jlproj: k parameter controls output length; null in, null out") {
    GraftExtensions.register(spark)
    val emb = Tables(spark, sf("sf0.001"), "embeddings").limit(10)
    val lens = emb.select(size(expr("graft_jlproj(embedding, 3)")).as("l"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(lens === Seq(3))
    val nulls = emb
      .select(expr("graft_jlproj(CAST(NULL AS ARRAY<FLOAT>), 8)").as("p"))
      .filter(col("p").isNotNull).count()
    assert(nulls === 0)
  }

  test("graft_jlproj: a null ELEMENT nulls the whole projection (HOF twin semantics)") {
    GraftExtensions.register(spark)
    // the HOF fold turns one null element into all-null component sums;
    // the kernel must not silently read 0 for the null slot
    val withNullElem = spark.sql(
      "SELECT graft_jlproj(CAST(array(1.0, NULL, 2.0) AS ARRAY<FLOAT>), 8) AS p")
    assert(withNullElem.filter(col("p").isNotNull).count() === 0)
    // and an all-present literal array still projects
    val ok = spark.sql(
      "SELECT graft_jlproj(CAST(array(1.0, -1.0, 2.0) AS ARRAY<FLOAT>), 8) AS p")
    assert(ok.filter(col("p").isNull).count() === 0)
  }
}
