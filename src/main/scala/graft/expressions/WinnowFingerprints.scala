package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) —
  * `graft_winnow(text, win, k)`: stride-1 rolling window hashes (O(n),
  * [[WindowHash.computeRolling]]) winnowed by selecting, in every run of
  * `k` consecutive window hashes, the RIGHTMOST minimum; a position is
  * emitted once even when it wins several runs. Output is the sorted
  * distinct fingerprint set (set semantics — duplication screens join on
  * membership, and a sorted array is deterministic for the oracle).
  *
  * The GUARANTEE the strided screen (q_substring_dup) lacks: any shared
  * substring of length ≥ win + k − 1 contains a full k-run of both
  * documents' window hashes, and the winnow of identical hash runs picks
  * identical values — so the two documents ALWAYS share ≥ 1 fingerprint,
  * at ANY alignment (stride sampling only catches equal-residue
  * offsets). Density is ~2/(k+1) fingerprints per position — same
  * linear-in-corpus cost class as the strided form. WinnowingSpec pins
  * both the hash parity and the alignment-independence property.
  */
case class WinnowFingerprints(child: Expression, win: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType if win >= 1 && k >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_winnow window/k must be >= 1, got ($win, $k)")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_winnow expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowFingerprints.compute(input.asInstanceOf[UTF8String].toString, win, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.WinnowFingerprints.compute($c.toString(), $win, $k))")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}

object WinnowFingerprints {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WinnowFingerprints].getCanonicalName, "graft_winnow")

  val builder: Seq[Expression] => Expression = {
    case Seq(e,
        Literal(w: Int, IntegerType), Literal(k: Int, IntegerType)) =>
      WinnowFingerprints(e, w, k)
    case _ =>
      throw new IllegalArgumentException(
        "graft_winnow takes (string, <int literal win>, <int literal k>)")
  }

  /** Static kernel. Selects the rightmost minimum of each k-run of the
    * stride-1 window hashes; returns the SORTED DISTINCT selections. */
  def compute(str: String, win: Int, k: Int): Array[Long] = {
    val hs = WindowHash.computeRolling(str, win)
    if (hs.isEmpty) return Array.emptyLongArray
    val picked = new java.util.TreeSet[java.lang.Long]()
    if (hs.length <= k) {
      // fewer hashes than one run: winnow the whole sequence once
      var min = hs(0)
      var i = 1
      while (i < hs.length) { if (hs(i) <= min) min = hs(i); i += 1 }
      picked.add(min)
    } else {
      var start = 0
      while (start + k <= hs.length) {
        // rightmost minimum of hs[start, start+k)
        var idx = start
        var i = start + 1
        while (i < start + k) { if (hs(i) <= hs(idx)) idx = i; i += 1 }
        picked.add(hs(idx))
        start += 1
      }
    }
    val out = new Array[Long](picked.size)
    val it = picked.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}
