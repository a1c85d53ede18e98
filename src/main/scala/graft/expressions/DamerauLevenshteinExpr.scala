package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE Damerau-Levenshtein distance (Lowrance-Wagner, with the
  * last-occurrence table — "CA"→"ABC" is 2, not the OSA 3) as a codegen
  * expression. Spark ships plain `levenshtein` only; adjacent-swap typos
  * are the most common real-world edit, and record linkage wants them
  * charged 1, not 2.
  *
  * Pinned to DuckDB's built-in `damerau_levenshtein` (verified on 3000
  * real name pairs before landing, and continuously by q_damerau's
  * oracle). Integer output — no rounding hazards at all.
  */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DataTypes.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_damerau expects (string, string), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshteinExpr.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.DamerauLevenshteinExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshteinExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_damerau"
}

object DamerauLevenshteinExpr {

  /** Static kernel (called from generated code). */
  def compute(ua: UTF8String, ub: UTF8String): Int =
    damerau(ua.toString, ub.toString)

  def damerau(s1: String, s2: String): Int = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    val inf = l1 + l2
    // (l1+2) x (l2+2) matrix with the Lowrance-Wagner border
    val d = Array.ofDim[Int](l1 + 2, l2 + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= l1) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= l2) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val i1: Int = { val v = da.get(s2.charAt(j - 1)); if (v == null) 0 else v }
        val j1 = db
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) { db = j; 0 } else 1
        val subst = d(i)(j) + cost
        val insert = d(i + 1)(j) + 1
        val delete = d(i)(j + 1) + 1
        val transp = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(subst, insert), math.min(delete, transp))
        j += 1
      }
      da.put(s1.charAt(i - 1), i)
      i += 1
    }
    d(l1 + 1)(l2 + 1)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DamerauLevenshteinExpr].getCanonicalName, "graft_damerau")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_damerau takes exactly 2 arguments")
    DamerauLevenshteinExpr(children.head, children(1))
  }
}
