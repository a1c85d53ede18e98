package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def register(): Unit = GraftExtensions.register(spark)

  test("exact when capacity covers the distinct vocabulary (== exact top-k)") {
    register()
    val tokens = Tables(spark, sf("sf0.001"), "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val distinctCount = tokens.select("token").distinct().count().toInt
    val sketch = tokens
      .agg(expr(s"graft_heavy_hitters(token, ${distinctCount + 10})").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value").as("token"), col("e.cnt").as("cnt"), col("e.err"))
      .limit(20).collect()
    val exact = tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(20)
      .as[(String, Long)].collect()
    assert(sketch.map(r => (r.getString(0), r.getLong(1))).toSeq === exact.toSeq)
    assert(sketch.forall(_.getLong(2) === 0L), "exact regime must carry err = 0")
  }

  test("bounded capacity on skew: true heavy hitter surfaces, counts bounded") {
    register()
    // zipf-ish: "hot" dominates, long tail of singletons
    val rows = (1 to 2000).map(i =>
      if (i % 2 == 0) "hot" else if (i % 3 == 0) "warm" else s"tail$i")
    val df = rows.toDF("token").repartition(8) // force partial + merge path
    val out = df.agg(expr("graft_heavy_hitters(token, 16)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.cnt"), col("e.err"))
      .collect()
    assert(out.length === 16)
    val top = out.head
    assert(top.getString(0) === "hot")
    val trueHot = rows.count(_ == "hot").toLong
    // SpaceSaving guarantee: estimate >= true count, overestimate <= err
    assert(top.getLong(1) >= trueHot)
    assert(top.getLong(1) - top.getLong(2) <= trueHot)
  }

  test("merge is order-insensitive in the exact regime") {
    register()
    val rows = (1 to 500).map(i => s"v${i % 23}")
    def run(parts: Int): Seq[Row] =
      rows.toDF("token").repartition(parts)
        .agg(expr("graft_heavy_hitters(token, 64)").as("hh"))
        .select(explode(col("hh")).as("e")).select(col("e.*")) // value, cnt, err
        .collect().toSeq
    assert(run(1) === run(13))
  }
}
