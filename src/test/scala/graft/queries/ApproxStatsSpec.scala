package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Error-bound gate for q_approx_stats — the driver records it rows-only
  * (sketch internals are engine-specific, no DuckDB oracle), which would
  * let a silently-broken sketch "pass". This spec makes the quality
  * claims falsifiable: HLL distinct counts must sit within the relative
  * standard deviation they were configured for, and the t-digest median
  * must land between exact neighboring quantiles.
  */
class ApproxStatsSpec extends SparkSpec {

  test("approx_count_distinct within its 2% rsd config vs exact") {
    val li = Tables(spark, sf("sf0.01"), "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("nd_approx"),
        countDistinct(col("l_partkey")).as("nd_exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("nd_approx").toDouble
      val exact = r.getAs[Long]("nd_exact").toDouble
      // rsd is a standard deviation, not a hard bound — allow 3 sigma
      assert(math.abs(approx - exact) / exact <= 0.06,
        s"flag=${r.get(0)}: approx=$approx exact=$exact off by " +
          f"${math.abs(approx - exact) / exact * 100}%.2f%%")
    }
  }

  test("percentile_approx p50 lands between exact p45 and p55") {
    val li = Tables(spark, sf("sf0.01"), "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("p50_approx"),
        percentile(col("l_extendedprice"), lit(0.45)).as("p45_exact"),
        percentile(col("l_extendedprice"), lit(0.5)).as("p50_exact"),
        percentile(col("l_extendedprice"), lit(0.55)).as("p55_exact"))
      .collect()
    rows.foreach { r =>
      val approx = r.getAs[Double]("p50_approx")
      assert(approx >= r.getAs[Double]("p45_exact") &&
        approx <= r.getAs[Double]("p55_exact"),
        s"flag=${r.get(0)}: p50_approx=$approx outside exact [p45, p55]")
      // and within 2% relative of the exact median (generous for acc=1000)
      val exact = r.getAs[Double]("p50_exact")
      assert(math.abs(approx - exact) / exact <= 0.02,
        s"flag=${r.get(0)}: p50_approx=$approx vs exact=$exact")
    }
  }

  test("q_approx_stats declared query runs and keys match exact grouping") {
    val out = MiscQueries.queries("q_approx_stats")(spark, sf("sf0.01"))
    val flags = out.select(col("l_returnflag")).collect().map(_.getString(0))
    assert(flags.toSeq.sorted === Seq("A", "N", "R"))
  }

  test("count-min sketch: overestimate-only, within eps*n of exact counts") {
    // the 4th sketch of the family (HLL distinct, t-digest quantiles,
    // SpaceSaving top-k, CMS point frequency): mergeable O(w*d) state,
    // the 100 TB substitute for an exact value_counts on an unbounded
    // key domain. CMS never undercounts and overcounts by at most eps*n
    // with prob 1-delta.
    val ev = Tables(spark, sf("sf0.01"), "events")
    val eps = 0.005
    val sketch = ev.stat.countMinSketch(col("event_type"), eps, 0.001, 42)
    val exact = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (k, cnt) =>
      val est = sketch.estimateCount(k)
      assert(est >= cnt, s"$k: CMS must never undercount ($est < $cnt)")
      assert(est <= cnt + (eps * n).toLong + 1,
        s"$k: est=$est exceeds exact=$cnt + eps*n=${(eps * n).toLong}")
    }
    // mergeability — the property that makes it distributable
    val half1 = ev.filter(col("event_id") % 2 === 0)
      .stat.countMinSketch(col("event_type"), eps, 0.001, 42)
    val half2 = ev.filter(col("event_id") % 2 =!= 0)
      .stat.countMinSketch(col("event_type"), eps, 0.001, 42)
    val merged = half1.mergeInPlace(half2)
    exact.keys.foreach { k =>
      assert(merged.estimateCount(k) >= exact(k))
    }
  }
}
