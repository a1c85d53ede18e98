package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused Jaccard similarity over two ARRAY<STRING> columns. Semantics are
  * exactly size(array_intersect(a,b)) / size(array_union(a,b)) for ANY
  * inputs (both set-ops dedup, and so does this kernel): |A∩B| and
  * |A|+|B|−|A∩B| over the distinct element sets are the same integers,
  * so the double division is bit-identical — but two hash sets replace
  * the two general-purpose set expressions per pair. JaccardFusionRule
  * rewrites the naive formulation into this automatically.
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
    val setB = new java.util.HashSet[UTF8String](y.numElements() * 2)
    var i = 0
    while (i < y.numElements()) {
      setB.add(if (y.isNullAt(i)) null else y.getUTF8String(i)); i += 1
    }
    val setA = new java.util.HashSet[UTF8String](x.numElements() * 2)
    i = 0
    while (i < x.numElements()) {
      setA.add(if (x.isNullAt(i)) null else x.getUTF8String(i)); i += 1
    }
    var inter = 0
    val it = setA.iterator()
    while (it.hasNext) { if (setB.contains(it.next())) inter += 1 }
    inter.toDouble / (setA.size + setB.size - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val setA = ctx.freshName("setA")
      val setB = ctx.freshName("setB")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val it = ctx.freshName("it")
      val inter = ctx.freshName("inter")
      val utf8 = classOf[UTF8String].getName
      s"""
         |java.util.HashSet<$utf8> $setB = new java.util.HashSet<$utf8>($b.numElements() * 2);
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  $setB.add($b.isNullAt($i) ? null : $b.getUTF8String($i));
         |}
         |java.util.HashSet<$utf8> $setA = new java.util.HashSet<$utf8>($a.numElements() * 2);
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  $setA.add($a.isNullAt($j) ? null : $a.getUTF8String($j));
         |}
         |int $inter = 0;
         |java.util.Iterator<$utf8> $it = $setA.iterator();
         |while ($it.hasNext()) { if ($setB.contains($it.next())) $inter++; }
         |${ev.value} = ((double) $inter) / ($setA.size() + $setB.size() - $inter);
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
