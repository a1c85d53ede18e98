package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd equi-depth bucket lookup: `graft_bucket(v, bounds)` =
  * the number of boundary values ≤ v (an upper-bound binary search), i.e.
  * the index of v's bucket in the interval partition
  * (−∞, b₀), [b₀, b₁), …, [bₖ₋₁, +∞) that a sorted boundary array
  * induces.
  *
  * This replaces the broadcast nested-loop RANGE join RangeBuckets used
  * for bucket assignment: the join evaluated every input row against all
  * ~65 (bucket, lo, hi) interval rows — ~65 comparisons per row and a
  * 65× join-probe loop in the hot scan — where the binary search does
  * ⌈log₂ 65⌉ = 7. Semantics are IDENTICAL for the operator's contract
  * (sorted boundaries, non-null elements): duplicate boundaries b,b
  * create an empty [b, b) interval in the join formulation, and the
  * count-of-≤ skips that index the same way; an EMPTY boundary array
  * yields bucket 0 for every row — the single (−∞, +∞) degenerate bucket
  * (RangeBuckets' declared empty-sample degrade).
  *
  * Null value or null array → null (callers drop null values first,
  * mirroring the inner range join's drop). Boundary elements are
  * non-null by contract (percentile_approx output). NaN values follow
  * Java primitive comparison (NaN ≤ b is false → bucket 0); no
  * RangeBuckets input column carries NaN.
  */
case class BucketBinarySearch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bucket expects (double, array<double>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[Double]
    val bs = b.asInstanceOf[ArrayData]
    var lo = 0
    var hi = bs.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bs.getDouble(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, bs) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $bs.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($bs.getDouble($mid) <= $v) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketBinarySearch =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bucket"
}

object BucketBinarySearch {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BucketBinarySearch].getCanonicalName, "graft_bucket")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_bucket takes exactly 2 arguments")
    BucketBinarySearch(children.head, children(1))
  }
}
