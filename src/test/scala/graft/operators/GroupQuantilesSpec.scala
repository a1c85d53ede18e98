package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** GroupQuantiles' two-pass bucketed selection must be BIT-IDENTICAL to
  * the quantile_cont contract it declares: value at rank p·(n−1) as
  * `v[k1]·(1−frac) + v[k2]·frac` (the exact expression DuckDB evaluates
  * — Spark's own `percentile` uses the algebraically-equal but
  * ulp-different `v1 + frac·(v2−v1)`, so the reference here is a
  * whole-group sorted-array twin evaluating the DECLARED shape, not the
  * Percentile aggregate). The operator exists to change the MEMORY
  * shape, never the answer. */
class GroupQuantilesSpec extends SparkSpec {

  private def compare(df: org.apache.spark.sql.DataFrame, group: String,
      value: String, ps: Seq[(String, Double)]): Unit = {
    val fast = GroupQuantiles.exact(df, group, value, ps)
    // whole-group reference: sort the group's values into an array and
    // interpolate with the identical expression shape (test-only — this
    // IS the buffer the operator exists to avoid)
    val aggs = ps.map { case (nm, p) =>
      // CAST(... AS DOUBLE): a bare 0.05 literal parses as DECIMAL in
      // Spark SQL and would change the arithmetic
      val pos = s"(CAST($p AS DOUBLE) * CAST(size(vs) - 1 AS DOUBLE))"
      expr(
        s"""CASE WHEN size(vs) = 1 THEN element_at(vs, 1) ELSE
           |  element_at(vs, CAST(floor($pos) AS INT) + 1)
           |    * (CAST(1.0 AS DOUBLE) - ($pos - floor($pos)))
           |  + element_at(vs, CAST(ceil($pos) AS INT) + 1)
           |    * ($pos - floor($pos))
           |END""".stripMargin).as(nm)
    }
    val ref = df.filter(col(value).isNotNull)
      .groupBy(col(group))
      .agg(sort_array(collect_list(col(value).cast("double"))).as("vs"))
      .select(col(group) +: aggs: _*)
    val mismatch = fast.drop("n").join(ref, Seq(group))
      .filter(ps.map { case (nm, _) =>
        // bit-exact (NaN-free inputs here, so plain =!= is the right test)
        fast(nm) =!= ref(nm)
      }.reduce(_ || _))
    assert(mismatch.count() === 0,
      s"two-pass selection diverged from the sorted-array twin for $ps")
  }

  test("matches percentile on lineitem price quartiles per return flag") {
    val li = Tables(spark, sf("sf0.001"), "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    compare(li, "l_returnflag", "l_extendedprice",
      Seq(("q25", 0.25), ("q50", 0.5), ("q75", 0.75)))
  }

  test("matches percentile on customer balances incl. tail quantiles") {
    val c = Tables(spark, sf("sf0.001"), "customer")
      .select(col("c_mktsegment"), col("c_acctbal"))
    compare(c, "c_mktsegment", "c_acctbal",
      Seq(("p05", 0.05), ("p50", 0.5), ("p95", 0.95), ("p0", 0.0), ("p1", 1.0)))
  }

  test("edge cases: single-row groups, ties, nulls ignored") {
    import spark.implicits._
    val df = Seq(
      ("solo", Some(42.0)),
      ("ties", Some(7.0)), ("ties", Some(7.0)), ("ties", Some(7.0)),
      ("mix", Some(1.0)), ("mix", Some(2.0)), ("mix", None),
      ("mix", Some(3.0)), ("mix", Some(4.0))
    ).toDF("g", "v")
    compare(df, "g", "v", Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)))
    // spot-check the interpolation against hand-computed values
    val out = GroupQuantiles.exact(df, "g", "v", Seq(("p25", 0.25)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("solo") === ((1L, 42.0)))
    assert(out("ties") === ((3L, 7.0)))
    assert(out("mix") === ((4L, 1.75))) // pos = 0.25*3 = 0.75 → 1 + 0.75·(2−1)
  }

  test("n column counts non-null rows per group") {
    val li = Tables(spark, sf("sf0.001"), "lineitem")
    val n = GroupQuantiles.exact(li, "l_returnflag", "l_quantity",
      Seq(("m", 0.5))).select(sum(col("n"))).head().getLong(0)
    assert(n === li.filter(col("l_quantity").isNotNull).count())
  }
}
