package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Banded random-hyperplane LSH signature as ARRAY<LONG> — one band key
  * per element, band width `r` UNBOUNDED by a single long's 60 usable
  * bits (the round-3 scale ceiling: `graft_rpsig` packs all bands into
  * one BIGINT, so r clamps at 15 and past n ≈ 16·2¹⁵ the per-band bucket
  * space stops growing and intra-bucket pair work goes quadratic again).
  *
  * Element b (0-based) carries sign bits for planes j = b·r … b·r+r−1,
  * bit i of the element = plane b·r+i — exactly the slice
  * `(graft_rpsig(emb, nBands·r) >> b·r) & (2^r − 1)` whenever both forms
  * are defined, so consumers' band keys (and every recorded hash) are
  * unchanged for r ≤ 15 (RpBandsSpec pins the equivalence). Each band
  * key lives in its own long, so r ranges up to 62.
  *
  * `r` is a regular INT child, not a literal: the adaptive width
  * r = f(count(*)) can be computed INSIDE the plan (one-row broadcast
  * params subtree, the RangeBuckets pattern) instead of a driver-side
  * `count()` action per query build.
  *
  * Plane signs use the same engine-portable ±1 weight family as
  * [[FloatRpSig]]: w(j,d) = ((j·131071 + d·524287 + 17) mod 1000003)
  * even ? +1 : −1, folded as the exact sequential double sum of the HOF
  * / DuckDB formulation.
  */
case class FloatRpBands(emb: Expression, bands: Expression, width: Expression)
    extends TernaryExpression {

  override def first: Expression = emb
  override def second: Expression = bands
  override def third: Expression = width

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // nullable even over non-nullable children: a null ELEMENT nulls the row
  // (parquet float arrays are element-nullable; getFloat on a null slot would
  // silently read 0 and flip sign bits differently from the null-propagating
  // HOF/DuckDB formulation — same contract as JlProjectExpr/FloatDotProduct)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (emb.dataType, bands.dataType, width.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (e, b, w) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_rpbands expects (array<float>, int, int), got " +
            s"(${e.simpleString}, ${b.simpleString}, ${w.simpleString})")
    }

  override protected def nullSafeEval(embV: Any, bandsV: Any, widthV: Any): Any = {
    val a = embV.asInstanceOf[ArrayData]
    val nb = bandsV.asInstanceOf[Int]
    val r = widthV.asInstanceOf[Int]
    val out = FloatRpBands.compute(a, nb, r)
    if (out == null) null else new GenericArrayData(out)
  }

  // Full codegen, not nullSafeCodeGen: the null-element → NULL-row path
  // assigns the expression's own null flag, which nullSafeCodeGen's
  // contract forbids (it may render ev.isNull as an unassignable literal
  // — the FloatDotProduct round-11 defect; this expression only compiled
  // because nullable=true kept the flag a variable. Owning the flag makes
  // that robustness explicit instead of incidental.)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eg = emb.genCode(ctx)
    val bg = bands.genCode(ctx)
    val wg = width.genCode(ctx)
    val out = ctx.freshName("out")
    ev.copy(code =
      code"""
        ${eg.code}
        ${bg.code}
        ${wg.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${eg.isNull} && !${bg.isNull} && !${wg.isNull}) {
          long[] $out = graft.expressions.FloatRpBands.compute(
            ${eg.value}, ${bg.value}, ${wg.value});
          if ($out != null) {
            ${ev.isNull} = false;
            ${ev.value} =
              new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): FloatRpBands =
    copy(emb = newFirst, bands = newSecond, width = newThird)

  override def prettyName: String = "graft_rpbands"
}

object FloatRpBands {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[FloatRpBands].getCanonicalName, "graft_rpbands")

  val builder: Seq[Expression] => Expression = {
    case Seq(e, b, w) => FloatRpBands(e, b, w)
    case _ =>
      throw new IllegalArgumentException(
        "graft_rpbands takes (array<float> emb, int nBands, int r)")
  }

  /** Static kernel (shared by eval and generated code). Band b's key: bit
    * i set iff Σ_d w(b·r+i, d)·emb[d] ≥ 0 — the identical plane/weight
    * stream `FloatRpSig` packs into one long, re-chunked per band.
    * Returns null (→ NULL row) if any embedding element is null. */
  def compute(a: ArrayData, nBands: Int, r: Int): Array[Long] = {
    require(nBands >= 1 && nBands <= 64,
      s"graft_rpbands band count must be in [1, 64], got $nBands")
    require(r >= 1 && r <= 62,
      s"graft_rpbands band width must be in [1, 62], got $r")
    val n = a.numElements()
    var p = 0
    while (p < n) {
      if (a.isNullAt(p)) return null
      p += 1
    }
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var key = 0L
      var i = 0
      while (i < r) {
        val j = b * r + i
        var s = 0.0
        var d = 0
        while (d < n) {
          val m = (j * 131071L + d * 524287L + 17L) % 1000003L
          val w = if (m % 2 == 0) 1.0 else -1.0
          s += w * a.getFloat(d).toDouble
          d += 1
        }
        if (s >= 0) key |= 1L << i
        i += 1
      }
      out(b) = key
      b += 1
    }
    out
  }
}
