package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 16-bit SimHash over whitespace tokens of a string — one pass
  * per row: tokenize, rolling-hash each token (mod 1e9+7, the engine-
  * portable formulation in TextAnalytics), vote per bit, majority.
  *
  * Exists because the HOF formulation references its token-hash array 16×
  * and Catalyst's CollapseProject inlines the array-building expression
  * into every reference — a 16× recompute per row that made the simhash
  * pair query ~20s at sf0.1. Identical results for single-space ASCII
  * text (split with limit −1 matches Spark's `split(text, ' ')`; char
  * codes match `ascii()` for BMP input). Parity asserted against the HOF
  * form in TokenSimHash16Spec and against DuckDB by q_simhash/
  * q_simhash_pairs.
  */
case class TokenSimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash16 expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TokenSimHash16.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TokenSimHash16.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenSimHash16 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash16"
}

object TokenSimHash16 {
  private val P = 1000000007L

  /** Static kernel (called from generated code). */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    val tokens = str.split(" ", -1) // limit -1 == Spark's split(text, ' ')
    val votes = new Array[Int](16)
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      var h = 0L
      var i = 0
      while (i < tok.length) {
        h = (h * 31 + tok.charAt(i)) % P
        i += 1
      }
      var b = 0
      while (b < 16) {
        votes(b) += ((h >> b) & 1L).toInt
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) {
      if (2 * votes(b) > tokens.length) sig |= 1L << b
      b += 1
    }
    sig
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TokenSimHash16].getCanonicalName, "graft_simhash16")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_simhash16 takes exactly 1 argument")
    TokenSimHash16(children.head)
  }
}
