package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val facts = (1L to 500L).map(i => (i, i % 97)).toDF("fid", "p")
  private lazy val intervals = Seq(
    (1L, 0L, 10L), (2L, 5L, 9L), (3L, 90L, 120L), (4L, 40L, 41L))
    .toDF("iid", "lo", "hi")

  test("bucketed range join equals the broadcast nested-loop reference") {
    val a = RangeJoin.bucketed(facts, intervals,
      col("p"), col("lo"), col("hi"), 8L)
      .select("fid", "iid").orderBy("fid", "iid").collect()
    val b = RangeJoin.broadcastRange(facts, intervals,
      col("p"), col("lo"), col("hi"))
      .select("fid", "iid").orderBy("fid", "iid").collect()
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq)
  }

  test("bucketed plan is an equi-join: no cartesian, no nested loop") {
    val p = RangeJoin.bucketed(facts, intervals,
      col("p"), col("lo"), col("hi"), 8L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("boundary inclusivity matches SQL BETWEEN on both ends") {
    val out = RangeJoin.bucketed(
      Seq((1L, 5L), (2L, 9L), (3L, 4L), (4L, 10L)).toDF("fid", "p"),
      Seq((1L, 5L, 9L)).toDF("iid", "lo", "hi"),
      col("p"), col("lo"), col("hi"), 3L)
      .select("fid").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L))
  }
}
