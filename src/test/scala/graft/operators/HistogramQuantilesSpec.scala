package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** HistogramQuantiles is the value-counts specialization of
  * GroupQuantiles: the SAME quantile_cont interpolation, selected from a
  * (group, value, weight) histogram instead of the fact rows. The
  * equivalence that matters is BIT-exactness against GroupQuantiles.exact
  * on the expanded rows — the operator changes the access path, never the
  * answer (three declared queries' oracle hashes ride on it). */
class HistogramQuantilesSpec extends SparkSpec {

  private def compare(rows: org.apache.spark.sql.DataFrame, group: String,
      value: String, ps: Seq[(String, Double)]): Unit = {
    val vc = rows.filter(col(value).isNotNull)
      .groupBy(col(group), col(value)).agg(count(lit(1)).as("w"))
    val hist = HistogramQuantiles.quantiles(vc, group, value, "w", ps)
    val ref = GroupQuantiles.exact(rows, group, value, ps)
    val refCols = col(group) +: col("n").as("n_ref") +:
      ps.map { case (nm, _) => col(nm).as(s"${nm}_ref") }
    val mismatch = hist.join(ref.select(refCols: _*), Seq(group))
      .filter(ps.map { case (nm, _) =>
        col(nm) =!= col(s"${nm}_ref") // bit-exact; inputs are NaN-free
      }.reduceLeft(_ || _) || col("n") =!= col("n_ref"))
    assert(mismatch.count() === 0,
      s"histogram selection diverged from GroupQuantiles for $ps")
  }

  test("matches GroupQuantiles on integer cents per return flag") {
    val li = Tables(spark, sf("sf0.001"), "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    compare(li, "l_returnflag", "cents",
      Seq(("p05", 0.05), ("med", 0.5), ("p95", 0.95), ("p0", 0.0), ("p1", 1.0)))
  }

  test("matches GroupQuantiles on randomized heavy-tie weighted values") {
    import spark.implicits._
    // deterministic pseudo-random rows with heavy ties (small value
    // domain) — the histogram regime the operator exists for
    val rows = (1 to 5000).map { i =>
      val g = s"g${i % 7}"
      val v = ((i * 2654435761L) % 97 + 13).toDouble
      (g, v)
    }.toDF("g", "v")
    compare(rows, "g", "v", Seq(("q25", 0.25), ("med", 0.5), ("q75", 0.75)))
  }

  test("edge cases: single-value groups, all-ties, null values ignored") {
    import spark.implicits._
    val df = Seq(
      ("solo", Some(42.0)),
      ("ties", Some(7.0)), ("ties", Some(7.0)), ("ties", Some(7.0)),
      ("mix", Some(1.0)), ("mix", Some(2.0)), ("mix", None),
      ("mix", Some(3.0)), ("mix", Some(4.0))
    ).toDF("g", "v")
    compare(df, "g", "v", Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)))
    val vc = df.filter(col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("w"))
    val out = HistogramQuantiles.quantiles(vc, "g", "v", "w", Seq(("p25", 0.25)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("solo") === ((1L, 42.0)))
    assert(out("ties") === ((3L, 7.0)))
    assert(out("mix") === ((4L, 1.75))) // pos = 0.25·3 = 0.75 → 1 + 0.75·(2−1)
  }
}
