package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The generic named-frame ensure cache: builds once per key, serves
  * parquet read-backs that equal the built frames, and keeps names
  * stable across calls. */
class FrameCacheSpec extends SparkSpec {
  import spark.implicits._

  test("builds once per key; read-backs equal the built frames by name") {
    var builds = 0
    val key = s"spec#fc#${System.nanoTime()}"
    def ensure() = FrameCache.ensure(spark, key) {
      builds += 1
      val a = (1L to 100L).toDF("x").withColumn("y", col("x") * 2)
      val b = (1L to 10L).toDF("k")
      Seq("big" -> a, "small" -> b)
    }
    val f1 = ensure()
    val f2 = ensure()
    assert(builds === 1)
    assert(f1.keySet === Set("big", "small") && f2.keySet === f1.keySet)
    val got = f2("big").orderBy(col("x")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === (1L to 100L).map(x => (x, x * 2)))
    assert(f2("small").count() === 10L)
  }

  test("distinct keys build independently") {
    var builds = 0
    def ensure(key: String) = FrameCache.ensure(spark, key) {
      builds += 1
      Seq("t" -> Seq(builds).toDF("b"))
    }
    val k = System.nanoTime()
    val a = ensure(s"spec#fc1#$k")("t").head.getInt(0)
    val b = ensure(s"spec#fc2#$k")("t").head.getInt(0)
    assert(builds === 2 && a === 1 && b === 2)
  }
}
