package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native windowed rolling-hash fingerprints — one pass per row:
  * `graft_winhash(text, win, stride)` returns the polynomial rolling
  * hash (mod 1e9+7, base 31 — the exact charHash family of
  * TextAnalytics) of every `win`-char window at offsets 0, stride,
  * 2·stride, …; empty array when the text is shorter than one window.
  *
  * This is the substring-duplication screen's kernel (q_substring_dup):
  * the HOF twin — `transform(sequence(...), i -> aggregate(split(
  * substring(text, i·stride+1, win), ''), ...))` — evaluates ~win
  * interpreted lambda calls per window; this is one fused codegen loop.
  * WindowHashSpec pins bit-parity against the HOF form (which is also
  * the DuckDB oracle's formulation), so swapping it in changes
  * performance only.
  */
case class WindowHash(child: Expression, win: Int, stride: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType if win >= 1 && stride >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_winhash window/stride must be >= 1, got ($win, $stride)")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_winhash expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WindowHash.compute(input.asInstanceOf[UTF8String], win, stride))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.WindowHash.compute($c, $win, $stride))")

  override protected def withNewChildInternal(newChild: Expression): WindowHash =
    copy(child = newChild)

  override def prettyName: String = "graft_winhash"
}

object WindowHash {
  private val P = 1000000007L

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WindowHash].getCanonicalName, "graft_winhash")

  val builder: Seq[Expression] => Expression = {
    case Seq(e,
        Literal(w: Int, IntegerType), Literal(s: Int, IntegerType)) =>
      WindowHash(e, w, s)
    case _ =>
      throw new IllegalArgumentException(
        "graft_winhash takes (string, <int literal win>, <int literal stride>)")
  }

  /** Decode to an Array[Int] of Unicode codepoints. The HOF twin
    * (split('')/ascii) and the DuckDB oracle (string_split/ascii) both
    * fold CODEPOINT values with codepoint-counted windows — UTF-16
    * code-unit iteration would diverge on any supplementary-plane
    * character (emoji, CJK ext-B), so windows and hash terms are
    * codepoint-based throughout. Identical to charAt for ASCII/BMP. */
  private[expressions] def codepoints(str: String): Array[Int] = {
    val out = new Array[Int](str.codePointCount(0, str.length))
    var ci = 0
    var i = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      out(i) = cp
      i += 1
      ci += Character.charCount(cp)
    }
    out
  }

  /** Static kernel (called from generated code). Matches the HOF fold:
    * h = (h·31 + codepoint) mod 1e9+7 over the window's codepoints. */
  def compute(s: UTF8String, win: Int, stride: Int): Array[Long] = {
    val cps = codepoints(s.toString)
    val n = cps.length
    if (n < win) return Array.emptyLongArray
    val nw = (n - win) / stride + 1
    val out = new Array[Long](nw)
    var w = 0
    while (w < nw) {
      var h = 0L
      var i = w * stride
      val end = i + win
      while (i < end) {
        h = (h * 31 + cps(i)) % P
        i += 1
      }
      out(w) = h
      w += 1
    }
    out
  }

  /** Stride-1 window hashes in O(n) via the rolling recurrence
    * h' = (h − c_out·31^(win−1))·31 + c_in (mod p) — identical values to
    * [[compute]](s, win, 1), which re-folds each window in O(win). */
  def computeRolling(str: String, win: Int): Array[Long] = {
    val cps = codepoints(str)
    val n = cps.length
    if (n < win) return Array.emptyLongArray
    // 31^(win-1) mod p
    var pow = 1L
    var e = 0
    while (e < win - 1) { pow = pow * 31 % P; e += 1 }
    val out = new Array[Long](n - win + 1)
    var h = 0L
    var i = 0
    while (i < win) { h = (h * 31 + cps(i)) % P; i += 1 }
    out(0) = h
    var w = 1
    while (w <= n - win) {
      val cOut = cps(w - 1).toLong
      val cIn = cps(w + win - 1).toLong
      h = ((h - cOut * pow % P + P) % P * 31 + cIn) % P
      out(w) = h
      w += 1
    }
    out
  }
}
