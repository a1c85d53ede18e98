package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native random-hyperplane LSH signature over an ARRAY<FLOAT> embedding
  * (`planes` sign bits; the ANN/dedup bucketing key).
  *
  * Bit j is set iff Σ_d w(j,d)·emb[d] ≥ 0 with the engine-portable ±1
  * weight w(j,d) = ((j·131071 + d·524287 + 17) mod 1000003) even ? +1 : −1.
  * The fold is the exact sequential double sum of the HOF formulation
  * (see FloatRpSigSpec's `hofSig`) and the DuckDB oracle — swapping this in
  * changes performance only (parity asserted in FloatRpSigSpec).
  *
  * `graft_rpsig(emb)` keeps the original 8 planes; `graft_rpsig(emb, n)`
  * (n a literal, 1..60) is the banded-LSH form: consumers slice the
  * signature into b bands of r bits each (n = b·r) and equi-join per band —
  * the AND-OR construction whose bucket count scales with n instead of
  * being fixed at 256 (see SimilarityQueries for the adaptive-r sizing).
  */
case class FloatRpSig(child: Expression, planes: Int = 8) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) if planes >= 1 && planes <= 60 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_rpsig plane count must be in [1, 60], got $planes")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_rpsig expects array<float>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var sig = 0L
    var j = 0
    while (j < planes) {
      var s = 0.0
      var d = 0
      while (d < n) {
        val m = (j * 131071L + d * 524287L + 17L) % 1000003L
        val w = if (m % 2 == 0) 1.0 else -1.0
        s += w * a.getFloat(d).toDouble
        d += 1
      }
      if (s >= 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      s"""
         |int $n = $a.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < $planes; $j++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $m = ($j * 131071L + $d * 524287L + 17L) % 1000003L;
         |    $s += (($m % 2 == 0) ? 1.0 : -1.0) * ((double) $a.getFloat($d));
         |  }
         |  if ($s >= 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatRpSig =
    copy(child = newChild)

  override def prettyName: String = "graft_rpsig"
}

object FloatRpSig {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[FloatRpSig].getCanonicalName, "graft_rpsig")

  val builder: Seq[Expression] => Expression = { children =>
    children match {
      case Seq(e) => FloatRpSig(e)
      case Seq(e, Literal(p: Int, org.apache.spark.sql.types.IntegerType)) =>
        FloatRpSig(e, p)
      case _ =>
        throw new IllegalArgumentException(
          "graft_rpsig takes (array<float>) or (array<float>, <int literal planes>)")
    }
  }
}
