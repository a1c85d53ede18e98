package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit SimHash over whitespace tokens of a string — one pass per
  * row: tokenize, rolling-hash each token (mod 1e9+7, the engine-portable
  * formulation in TextAnalytics), vote per bit, majority.
  *
  * The token rolling hash only carries ~30 bits of entropy (it is reduced
  * mod 1e9+7), so a wide SimHash cannot use its raw bits — bits 30+ would
  * always vote 0. Bit b instead votes the parity of an independent salted
  * remix ((h·(1007b+31) + (2003b+7)) mod (2³¹−1); the MinHash constant
  * family), giving 60 independent vote streams from one token hash.
  * 60 bits (not 64) keeps every `1 << b` and the vote sum inside a signed
  * BIGINT on BOTH engines — DuckDB's `1 << 63` would flip the sign.
  *
  * Consumers slice the signature into 4 bands of 15 bits: pairs within
  * hamming distance ≤ 3 differ in ≤ 3 bands (pigeonhole), so a per-band
  * equi-join has EXACT recall for the ≤3 family — the classic multi-table
  * construction (Manku et al., WWW'07-style), not a probabilistic one.
  * Capacity: expected band-bucket occupancy is n/2¹⁵ per band; for corpora
  * where that grows large, widen the signature/bands (the structure is
  * parametric) — vs the previous fixed 256-bucket high-byte blocking whose
  * pair work grew as n²/256.
  */
case class TokenSimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash60 expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TokenSimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TokenSimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenSimHash60 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash60"
}

object TokenSimHash60 {
  private val P = 1000000007L
  private val PM = 2147483647L
  val bits = 60

  /** Static kernel (called from generated code). */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    val tokens = str.split(" ", -1) // limit -1 == Spark's split(text, ' ')
    val votes = new Array[Int](bits)
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      var h = 0L
      var i = 0
      while (i < tok.length) {
        h = (h * 31 + tok.charAt(i)) % P
        i += 1
      }
      var b = 0
      while (b < bits) {
        votes(b) += (((h * (1007L * b + 31L) + (2003L * b + 7L)) % PM) & 1L).toInt
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (2 * votes(b) > tokens.length) sig |= 1L << b
      b += 1
    }
    sig
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TokenSimHash60].getCanonicalName, "graft_simhash60")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_simhash60 takes exactly 1 argument")
    TokenSimHash60(children.head)
  }
}
