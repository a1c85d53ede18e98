package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Johnson–Lindenstrauss projection over an ARRAY<FLOAT> embedding:
  * `graft_jlproj(emb, k)` returns the k micro-scaled component sums
  *
  *   out[j] = Σ_i floor(emb[i]·10⁶ + 0.5) · sign(j, i)
  *
  * with the engine-portable sign(j, i) = ((j·256 + i) mod p · 2654435761
  * mod p) even ? +1 : −1 (p = 1000000007) — EXACTLY the arithmetic of the
  * q_jl_projection HOF/oracle formulation (integer accumulation makes the
  * sum order-independent, so the DuckDB oracle and any partitioning agree
  * bit for bit). The nested-HOF form evaluates ~k·dim interpreted lambda
  * calls per row; this is one fused codegen loop — parity is asserted in
  * JlProjectSpec, so swapping it in changes performance only.
  *
  * Null elements: parquet float arrays are element-nullable by default,
  * and `getFloat` on a null slot would silently read 0 — diverging from
  * the null-propagating HOF/oracle formulation (where a null element
  * nulls every component sum). A row whose embedding contains ANY null
  * element therefore yields a NULL result (the whole-array projection of
  * the HOF's all-components-null; the output type stays
  * containsNull = false).
  */
case class JlProjectExpr(child: Expression, k: Int = 8) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // nullable even over a non-nullable child: a null ELEMENT nulls the row
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) if k >= 1 && k <= 64 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_jlproj k must be in [1, 64], got $k")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_jlproj expects array<float>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val out = JlProjectExpr.compute(input.asInstanceOf[ArrayData], k)
    if (out == null) null else new GenericArrayData(out)
  }

  // Full codegen, not nullSafeCodeGen: the null-element → NULL-row path
  // assigns the expression's own null flag, which nullSafeCodeGen's
  // contract forbids (it may render ev.isNull as an unassignable literal
  // — the FloatDotProduct round-11 defect; this expression only compiled
  // because nullable=true kept the flag a variable). Generated code calls
  // the same static kernel as eval, so interpreted ≡ codegen by
  // construction.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cg = child.genCode(ctx)
    val out = ctx.freshName("out")
    ev.copy(code =
      code"""
        ${cg.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${cg.isNull}) {
          long[] $out = graft.expressions.JlProjectExpr.compute(${cg.value}, $k);
          if ($out != null) {
            ${ev.isNull} = false;
            ${ev.value} =
              new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): JlProjectExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_jlproj"
}

object JlProjectExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[JlProjectExpr].getCanonicalName, "graft_jlproj")

  val builder: Seq[Expression] => Expression = { children =>
    children match {
      case Seq(e) => JlProjectExpr(e)
      case Seq(e, Literal(p: Int, org.apache.spark.sql.types.IntegerType)) =>
        JlProjectExpr(e, p)
      case _ =>
        throw new IllegalArgumentException(
          "graft_jlproj takes (array<float>) or (array<float>, <int literal k>)")
    }
  }

  /** Static kernel (shared by eval and generated code): the k micro-scaled
    * component sums, or null (→ NULL row) if any element is null. */
  def compute(a: ArrayData, k: Int): Array[Long] = {
    val n = a.numElements()
    var p = 0
    while (p < n) {
      if (a.isNullAt(p)) return null
      p += 1
    }
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var s = 0L
      var i = 0
      while (i < n) {
        val micro = math.floor(a.getFloat(i).toDouble * 1000000 + 0.5).toLong
        val h = (j * 256L + i) % 1000000007L * 2654435761L % 1000000007L
        s += (if (h % 2 == 0) micro else -micro)
        i += 1
      }
      out(j) = s
      j += 1
    }
    out
  }
}
