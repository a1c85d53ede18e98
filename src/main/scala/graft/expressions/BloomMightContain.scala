package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(bloom_bytes, key)` — membership probe against a
  * serialized `org.apache.spark.util.sketch.BloomFilter`, the broadcast
  * pre-filter for joins whose build side is too large to broadcast as a
  * hash relation but whose *bloom* fits comfortably (~10 bits/key at 1%
  * fpp: 100 M build keys ≈ 120 MB hash set vs ≈ 120 KB … 12 MB bloom
  * depending on fpp). The probe side is filtered BEFORE its shuffle, so
  * the exchange moves only rows that might match; the exact join
  * afterwards removes the false positives, which is why a query using
  * this kernel can hash-match a plain-join oracle bit-for-bit.
  *
  * This is the same shape Spark's own InjectRuntimeFilter produces
  * (`BloomFilterMightContain` over a `bloom_filter_agg` subquery) — that
  * rule is internal and threshold-gated (10 GB probe-side scans), so the
  * engine exposes the kernel explicitly: the filter is built once with
  * the public `DataFrameStatFunctions.bloomFilter` (a distributed
  * treeAggregate; only the final ~KB–MB sketch reaches the driver) and
  * embedded as a binary literal that ships with the plan.
  *
  * Contract: `bloom` must be FOLDABLE binary (a literal) — the filter is
  * deserialized once per (executor, plan) via a transient lazy, never per
  * row — and `key` must be LONG (`putLong`/`mightContainLong` hashing,
  * matching what `stat.bloomFilter` uses for integral columns). Null key
  * → null (standard null-intolerant binary expression).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        // catch a null sketch at ANALYSIS: on the interpreted path a null
        // literal would short-circuit BinaryExpression.eval to null
        // (silently filtering every row) while the codegen path forces
        // the lazy bloom and throws — same query, opposite behavior
        // depending on codegen mode. Foldable ⇒ eval() is safe here.
        if (left.eval() == null)
          TypeCheckResult.TypeCheckFailure(
            "graft_bloom_contains: the bloom sketch literal is null")
        else TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bloom_contains expects a FOLDABLE bloom literal — " +
            "deserializing per row would dominate the probe")
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_contains expects (binary, bigint), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  // One deserialization per task/plan instance; the serialized bytes
  // travel inside the literal, so executors rebuild the same filter.
  // A null literal passes the type check (it's foldable binary) but has
  // no meaningful semantics — fail with a named error, not the bare NPE
  // ByteArrayInputStream(null) would throw mid-planning.
  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    require(bytes != null,
      "graft_bloom_contains: the bloom sketch literal is null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(bloomBytes: Any, key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The deserialized filter rides the codegen reference array — the
    // generated loop calls mightContainLong directly, no per-row work
    // beyond the hash probes.
    val bfRef = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, k) =>
      s"${ev.value} = $bfRef.mightContainLong($k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_contains"
}

object BloomMightContain {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BloomMightContain].getCanonicalName, "graft_bloom_contains")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      "graft_bloom_contains takes exactly 2 arguments")
    BloomMightContain(children.head, children(1))
  }
}
