package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, MutableProjection, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

import graft.SparkSpec
import graft.quality.CodegenGuard

/** The round-11 defect, resurrected on purpose: an expression that assigns
  * `ev.isNull` inside `nullSafeCodeGen` while declaring `nullable = false`.
  * With a non-nullable child, nullSafeCodeGen renders `ev.isNull` as the
  * literal `false`, so the generated Java contains `false = true;` — Janino
  * rejects it, Spark logs ERROR and silently executes interpreted. This is
  * exactly the shape `FloatDotProduct` had before the fix; it exists here
  * only to prove the CodegenGuard gate is non-vacuous.
  */
case class BrokenIsNullProbe(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override protected def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.isNull} = true; ${ev.value} = $a;") // out-of-contract on purpose
  override protected def withNewChildInternal(newChild: Expression): BrokenIsNullProbe =
    copy(child = newChild)
}

class CodegenGuardSpec extends SparkSpec {

  // Declaration order matters: the clean-surface checks run BEFORE the
  // deliberate trip so count deltas can't cross-contaminate (ScalaTest
  // runs a suite's tests sequentially in declaration order).

  test("q_auc_exact (the round-11 deterministic repro) runs with zero codegen fallbacks") {
    CodegenGuard.install()
    val before = CodegenGuard.count
    graft.SparkEntry.queries("q_auc_exact")(spark, sf("sf0.001"))
      .write.format("noop").mode("overwrite").save()
    assert(CodegenGuard.count === before,
      s"codegen degraded during q_auc_exact: ${CodegenGuard.captured.mkString("; ")}")
  }

  test("the fdot-heavy similarity family is codegen-clean") {
    CodegenGuard.install()
    val before = CodegenGuard.count
    Seq("q_cosine_topk", "q_semdedup", "q_embed_dedup_canon").foreach { q =>
      graft.SparkEntry.queries(q)(spark, sf("sf0.001"))
        .write.format("noop").mode("overwrite").save()
    }
    assert(CodegenGuard.count === before,
      s"codegen degraded: ${CodegenGuard.captured.mkString("; ")}")
  }

  test("guard is non-vacuous: the round-11 defect shape trips it") {
    CodegenGuard.install()
    val before = CodegenGuard.count
    // MutableProjection.create goes through CodeGeneratorWithInterpretedFallback:
    // the Janino failure is logged (ERROR + 'falling back to interpreter mode')
    // and execution continues interpreted — the exact silent path the guard exists
    // to catch.
    val proj: MutableProjection =
      MutableProjection.create(Seq(BrokenIsNullProbe(Literal(2.0))), Nil)
    val out = proj(InternalRow.empty).getDouble(0)
    assert(out === 2.0) // interpreted fallback still computes
    assert(CodegenGuard.count > before,
      "guard did not observe the codegen failure — the gate is vacuous")
    assert(CodegenGuard.captured.exists(l =>
      l.contains("Failed to compile") || l.contains("falling back to interpreter mode")))
  }
}
