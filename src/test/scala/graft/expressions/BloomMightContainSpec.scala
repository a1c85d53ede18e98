package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BloomMightContainSpec extends SparkSpec {
  import spark.implicits._

  private def bloomBytes(keys: Seq[Long], expected: Long = 10000L,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = keys.toDF("k").stat.bloomFilter("k", expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("no false negatives: every inserted key probes true") {
    GraftExtensions.register(spark)
    val keys = (0L until 5000L).map(_ * 7 + 3)
    val bytes = bloomBytes(keys)
    val hits = keys.toDF("k")
      .filter(call_function("graft_bloom_contains", lit(bytes), $"k"))
      .count()
    assert(hits === keys.size, "a bloom filter NEVER false-negatives")
  }

  test("false-positive rate stays near the configured fpp") {
    GraftExtensions.register(spark)
    val inserted = (0L until 5000L).map(_ * 2) // evens
    val bytes = bloomBytes(inserted, expected = 5000L, fpp = 0.01)
    val probes = (0L until 5000L).map(_ * 2 + 1) // odds — none inserted
    val fp = probes.toDF("k")
      .filter(call_function("graft_bloom_contains", lit(bytes), $"k"))
      .count()
    // 1% nominal; allow generous headroom against hash unluckiness
    assert(fp <= probes.size * 0.05,
      s"fp=$fp of ${probes.size} probes — far above the 1% target")
  }

  test("null key → null (row filtered out); interpreted == codegen") {
    GraftExtensions.register(spark)
    val bytes = bloomBytes(Seq(1L, 2L, 3L))
    val df = Seq(Some(1L), Some(999999L), None).toDF("k")
    val kept = df
      .filter(call_function("graft_bloom_contains", lit(bytes), $"k"))
      .collect()
    // 999999 may legitimately false-positive; the contract here is that
    // the inserted key survives and a null key NEVER does (null ≠ true)
    assert(kept.exists(r => !r.isNullAt(0) && r.getLong(0) == 1L))
    assert(!kept.exists(_.isNullAt(0)))
    // interpreted path (no codegen): force via eval on the expression
    val e = BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(bytes),
      org.apache.spark.sql.catalyst.expressions.Literal(1L))
    assert(e.eval(null) === true)
  }

  test("non-foldable bloom argument is rejected at analysis") {
    GraftExtensions.register(spark)
    val df = Seq((Array[Byte](1, 2), 1L)).toDF("b", "k")
    // Pin ANALYSIS-time rejection specifically: a bare assertThrows[Exception]
    // would still pass if the foldable check regressed into a per-row runtime
    // error, which is exactly the failure mode the check exists to prevent.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_bloom_contains", $"b", $"k")).collect()
    }
    assert(e.getMessage.contains("FOLDABLE"),
      s"expected the foldable-bloom type-check message, got: ${e.getMessage}")
  }

  test("round-trips the exact filter stat.bloomFilter built on a real table") {
    GraftExtensions.register(spark)
    val c = Tables(spark, sf("sf0.001"), "customer")
      .filter($"c_acctbal" > 9000).select($"c_custkey")
    val bf = c.stat.bloomFilter("c_custkey", 10000L, 0.02)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    val viaExpr = c
      .filter(call_function("graft_bloom_contains", lit(bytes), $"c_custkey"))
      .count()
    assert(viaExpr === c.count(), "every build-side key must probe true")
  }
}
