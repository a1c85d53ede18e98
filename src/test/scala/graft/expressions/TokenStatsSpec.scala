package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalytics._

/** Bit-parity of the native one-pass kernels with the portable HOF
  * formulations they replace (the oracle twins run the HOF text in
  * DuckDB, so HOF-parity here implies oracle-parity there).
  */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    GraftExtensions.register(spark)
    Seq(
      "the quick brown fox jumps over the lazy dog",
      "order by the big table with a window",
      "a", "", "  double  spaces  here",
      "dup dup dup of of the the the in is on for with",
      "query scan data small batch customer column join value vector"
    ).toDF("text")
  }

  test("graft_tokenstats matches the HOF split/filter formulation") {
    val langCols = langMarkers.map { case (l, ws) =>
      (expr(langScoreSpark(tokensSpark("text"), ws)) === col(s"ts.s_$l"))
        .as(s"ok_$l")
    }
    val checked = docs
      .withColumn("ts", expr("graft_tokenstats(text)"))
      .select(
        (expr(s"size(${tokensSpark("text")})") === col("ts.n_tokens")).as("ok_n") +:
        (expr(s"size(array_distinct(${tokensSpark("text")}))") === col("ts.n_distinct")).as("ok_d") +:
        (expr(langScoreSpark(tokensSpark("text"), stopwords)) === col("ts.stop_hits")).as("ok_s") +:
        langCols: _*)
    val bad = checked.filter(not(checked.columns.map(col).reduce(_ && _)))
    assert(bad.isEmpty, s"mismatches:\n${bad.collect().mkString("\n")}")
  }

  test("graft_jaccard_sorted matches set-op jaccard on sorted distinct hashes") {
    val toks = docs.filter(length(col("text")) > 1)
      .withColumn("tset", expr(s"array_sort(array_distinct(${tokenHashesSpark("text")}))"))
    val pairs = toks.as("a").crossJoin(toks.as("b"))
      .select(col("a.tset").as("ta"), col("b.tset").as("tb"))
    val checked = pairs.select(
      expr("graft_jaccard_sorted(ta, tb)").as("native"),
      expr(s"${jaccardSpark("ta", "tb")}").as("hof"))
    val bad = checked.filter(col("native") =!= col("hof"))
    assert(bad.isEmpty, s"mismatches:\n${bad.collect().mkString("\n")}")
    // identical-set pair scores exactly 1.0
    assert(checked.filter(col("native") === 1.0).count() >= toks.count())
  }
}
