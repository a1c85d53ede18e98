package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GlobalRowNumberSpec extends SparkSpec {
  import spark.implicits._

  test("reproduces the exact global order on heavily skewed values") {
    // 90% of rows share one value — fixed-width bucketing would funnel
    // them into one bucket; equi-depth must still return the exact
    // global (value, id) numbering
    val df = (1L to 5000L)
      .map(i => (i, if (i % 10 == 0) i.toDouble else 42.0))
      .toDF("id", "v")
      .repartition(8)
    val got = GlobalRowNumber.withRowNumber(df, "v", "rn", Seq("id"))
      .select(col("id"), col("v"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val expected = got.map(t => (t._1, t._2)).sortBy(t => (t._2, t._1))
      .zipWithIndex.map { case ((id, v), i) => (id, v) -> (i + 1L) }.toMap
    assert(got.length === 5000)
    got.foreach { case (id, v, rn) =>
      assert(rn === expected((id, v)), s"row ($id, $v)")
    }
  }

  test("plan: the only global window runs over the bucket table, not the data") {
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).cast("double").as("v"))
    val plan = GlobalRowNumber.withRowNumber(df, "v", "rn", Seq("id"))
      .queryExecution.optimizedPlan.toString
    // the raw frame's window must be partitioned (bucket-local); a
    // global single-task row_number over the data would show a Window
    // with an empty partition spec over the full-size relation
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, s"no window in plan:\n$plan")
    // the data-sized window must be partitioned by the bucket key; any
    // unpartitioned window may only be the offsets prefix-sum over the
    // nb-row count table (recognizable by __cnt)
    assert(windows.exists(_.contains("windowspecdefinition(__bucket")),
      s"expected a __bucket-partitioned window:\n$plan")
    windows.filterNot(_.contains("windowspecdefinition(__bucket")).foreach { w =>
      assert(w.contains("__cnt"),
        s"unpartitioned window over something other than the bucket counts:\n$w")
    }
  }
}
