package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** graft_winhash must be BIT-IDENTICAL to the HOF formulation it
  * replaces (the form the DuckDB oracle mirrors) — integer hashing
  * means there is no tolerance, any mismatch is a bug. */
class WindowHashSpec extends SparkSpec {

  private def hof(win: Int, stride: Int): String =
    s"""CASE WHEN length(text) >= $win THEN
       |  transform(sequence(0, (length(text) - $win) div $stride),
       |    i -> aggregate(split(substring(text, i * $stride + 1, $win), ''),
       |      CAST(0 AS BIGINT), (a, c) -> (a * 31 + ascii(c)) % 1000000007))
       |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin

  test("graft_winhash equals the HOF window fold on every document") {
    GraftExtensions.register(spark)
    val d = Tables(spark, sf("sf0.001"), "documents")
    Seq((64, 16), (32, 32), (50, 7)).foreach { case (w, s) =>
      val mism = d
        .select(expr(s"graft_winhash(text, $w, $s)").as("native"),
          expr(hof(w, s)).as("hof"))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(mism === 0, s"win=$w stride=$s")
    }
    // short-text edge: below one window -> empty array, never null
    val edge = spark.sql("SELECT graft_winhash('tiny', 64, 16) AS h")
    assert(edge.head().getSeq[Long](0).isEmpty)
  }

  test("graft_winhash iterates CODEPOINTS — parity with the HOF on non-BMP text") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // emoji (U+1F600, supplementary plane) + CJK + ASCII mix: UTF-16
    // code-unit iteration would see 2 units per emoji and diverge from
    // the HOF/DuckDB codepoint windows
    val texts = Seq(
      "a😀b😁cdef😂ghij",
      "😀😁😂😃😄😅",
      "汉字emoji😀混合text")
    val d = texts.toDF("text")
    Seq((4, 2), (3, 1)).foreach { case (w, s) =>
      val mism = d
        .select(expr(s"graft_winhash(text, $w, $s)").as("native"),
          expr(hof(w, s)).as("hof"))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(mism === 0, s"non-BMP win=$w stride=$s")
    }
  }
}
