package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

import graft.functions.FuzzyMatch

/** Native token_set_ratio over pre-tokenized (sorted-distinct) token
  * arrays — the codegen path the survey's §7.3 flagged as the optional
  * perf upgrade over the UDF. Delegates to the same JVM kernel
  * (FuzzyMatch.tokenSetRatioSorted) but skips the ScalaUDF converter
  * layer (WrappedArray + per-element catalyst↔scala conversion) that the
  * UDF pays per pair.
  */
case class TokenSetRatioExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_token_set_ratio expects (array<string>, array<string>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenSetRatioExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TokenSetRatioExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenSetRatioExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_token_set_ratio"
}

object TokenSetRatioExpr {

  /** Static kernel (called from generated code). */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val ta = new Array[String](a.numElements())
    var i = 0
    while (i < ta.length) { ta(i) = a.getUTF8String(i).toString; i += 1 }
    val tb = new Array[String](b.numElements())
    i = 0
    while (i < tb.length) { tb(i) = b.getUTF8String(i).toString; i += 1 }
    FuzzyMatch.tokenSetRatioSorted(scala.collection.immutable.ArraySeq.unsafeWrapArray(ta),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(tb))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TokenSetRatioExpr].getCanonicalName, "graft_token_set_ratio")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_token_set_ratio takes exactly 2 arguments")
    TokenSetRatioExpr(children.head, children(1))
  }
}
