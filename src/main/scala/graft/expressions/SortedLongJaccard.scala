package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard similarity over two SORTED, DISTINCT ARRAY<BIGINT> columns
  * (token-hash sets): a single merge pass replaces the per-pair HashSet
  * build of graft_jaccard — the right kernel when one side of a
  * similarity join is scored against many candidates, because the sort
  * is paid once per ROW while the merge is paid per PAIR.
  *
  * |A∩B| by sorted-merge; |A∪B| = |A|+|B|−|A∩B|. Inputs must already be
  * distinct and ascending (array_sort(array_distinct(...)) /
  * list_sort(list_distinct(...)) — both engines sort BIGINT identically),
  * so the division is bit-identical to the set formulation.
  */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_jaccard_sorted expects (array<bigint>, array<bigint>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val va = x.getLong(i)
      val vb = y.getLong(j)
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long $va = $a.getLong($i);
         |  long $vb = $b.getLong($j);
         |  if ($va == $vb) { $inter++; $i++; $j++; }
         |  else if ($va < $vb) { $i++; } else { $j++; }
         |}
         |${ev.value} = ((double) $inter) / ($na + $nb - $inter);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaccard_sorted"
}

object SortedLongJaccard {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedLongJaccard].getCanonicalName, "graft_jaccard_sorted")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_jaccard_sorted takes exactly 2 arguments")
    SortedLongJaccard(children.head, children(1))
  }
}
