package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused Jaccard similarity over two ARRAY<STRING> token SETS (inputs must
  * already be distinct — the dedup queries build them with
  * array_distinct). Semantics are exactly
  * size(array_intersect(a,b)) / size(array_union(a,b)) for distinct
  * inputs: |a∩b| and |a|+|b|−|a∩b| are the same integers, so the double
  * division is bit-identical — but one hash set and one probe pass
  * replace the two general-purpose set expressions per pair.
  */
case class StringSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_jaccard expects (array<string>, array<string>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val ny = y.numElements()
    val set = new java.util.HashSet[UTF8String](ny * 2)
    var i = 0
    while (i < ny) { set.add(y.getUTF8String(i)); i += 1 }
    val nx = x.numElements()
    var inter = 0
    i = 0
    while (i < nx) { if (set.contains(x.getUTF8String(i))) inter += 1; i += 1 }
    inter.toDouble / (nx + ny - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val utf8 = classOf[UTF8String].getName
      s"""
         |java.util.HashSet<$utf8> $set = new java.util.HashSet<$utf8>($b.numElements() * 2);
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  $set.add($b.getUTF8String($i));
         |}
         |int $inter = 0;
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  if ($set.contains($a.getUTF8String($j))) $inter++;
         |}
         |${ev.value} = ((double) $inter) / ($a.numElements() + $b.numElements() - $inter);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringSetJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaccard"
}

object StringSetJaccard {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[StringSetJaccard].getCanonicalName, "graft_jaccard")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_jaccard takes exactly 2 arguments")
    StringSetJaccard(children.head, children(1))
  }
}
