package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextAnalytics

/** Native one-pass per-document token statistics:
  * struct(n_tokens, n_distinct, stop_hits, s_en, s_fr, s_es, s_de, s_zh).
  *
  * Exists because the HOF formulation of quality scoring / language-ID
  * consumes the `split(text, ' ')` array 4–6 times per row, and Catalyst
  * inlines the tokenize expression into every consumer (lambda-bearing
  * expressions are excluded from both CollapseProject's cheapness check
  * and whole-stage-codegen subexpression elimination) — the recompute that
  * made q_quality_score 6× its baseline. A native expression has no
  * lambdas, so even when the projection collapses, subexpression
  * elimination evaluates it once per row; all downstream columns are
  * cheap GetStructField reads.
  *
  * Semantics match the portable HOF/DuckDB forms exactly (ref for the
  * quality/language heuristics: training-data brief; oracle twins in
  * TextQueries): tokens = split on single space with no limit, counts are
  * occurrence counts (duplicates count), n_distinct over exact strings.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStats.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_tokenstats expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)

  override def prettyName: String = "graft_tokenstats"
}

object TokenStats {

  /** Language order is TextAnalytics.langMarkers order (en, fr, es, de, zh). */
  val schema: StructType = StructType(
    Seq("n_tokens", "n_distinct", "stop_hits").map(StructField(_, IntegerType, nullable = false)) ++
      TextAnalytics.langMarkers.map { case (l, _) =>
        StructField(s"s_$l", IntegerType, nullable = false)
      })

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextAnalytics.stopwords.foreach(s.add)
    s
  }

  private val markerSets: Array[java.util.HashSet[String]] =
    TextAnalytics.langMarkers.map { case (_, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }.toArray

  /** Static kernel (called from generated code). One pass over the token
    * array; a small per-call HashSet tracks distinct tokens. */
  def compute(s: UTF8String): InternalRow = {
    val tokens = s.toString.split(" ", -1) // limit -1 == Spark's split(text, ' ')
    val nLangs = markerSets.length
    val distinct = new java.util.HashSet[String](tokens.length * 2)
    var stopHits = 0
    val langHits = new Array[Int](nLangs)
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      distinct.add(tok)
      if (stopSet.contains(tok)) stopHits += 1
      var l = 0
      while (l < nLangs) {
        if (markerSets(l).contains(tok)) langHits(l) += 1
        l += 1
      }
      t += 1
    }
    val out = new Array[Any](3 + nLangs)
    out(0) = tokens.length
    out(1) = distinct.size
    out(2) = stopHits
    var l = 0
    while (l < nLangs) { out(3 + l) = langHits(l); l += 1 }
    new GenericInternalRow(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TokenStats].getCanonicalName, "graft_tokenstats")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_tokenstats takes exactly 1 argument")
    TokenStats(children.head)
  }
}
