package graft.quality

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Zero-codegen-fallback gate (VERDICT r11 item 2).
  *
  * Spark treats a Janino compile failure of generated code as an
  * ERROR-level *log line*, then silently executes the projection in
  * interpreter mode (`CodeGeneratorWithInterpretedFallback`) or re-plans
  * without whole-stage codegen (`WholeStageCodegenExec`). Results stay
  * correct, so no functional gate catches it — but at scale an
  * interpreted projection over the hot path is a real regression that
  * would ship silently (exactly how the round-11 `graft_fdot` defect
  * survived 195 green oracles).
  *
  * This guard turns those log events into an assertable signal: a
  * log4j2 appender on the root logger captures any WARN+ event whose
  * message carries one of Spark's three codegen-degradation signatures
  * (string literals verified against the spark-catalyst/spark-sql 4.1.2
  * jars). `graft.Verify` and `graft.Bench` install it and fail their runs
  * (non-zero exit) if any event fired; CodegenGuardSpec proves the gate
  * is non-vacuous by resurrecting the round-11 defect shape and watching
  * the guard trip.
  *
  * The appender is installed on the ROOT logger config so it sees events
  * from every logger that reaches root (Spark's codegen loggers do; the
  * session's `setLogLevel("WARN")` keeps WARN+ flowing). Events are
  * capped to keep a pathological mass-fallback run from accumulating
  * unbounded strings — the COUNT keeps counting past the cap.
  */
object CodegenGuard {

  /** Spark 4.1.2 signatures, in order:
    *  - `CodeGenerator.compile` on a Janino error (ERROR + generated code);
    *  - `CodeGeneratorWithInterpretedFallback.createObject` on fallback;
    *  - `WholeStageCodegenExec` when a compiled stage is abandoned
    *    (compile error with fallback enabled, or bytecode over
    *    `spark.sql.codegen.hugeMethodLimit`).
    */
  private val markers = Seq(
    "Failed to compile the generated Java code",
    "falling back to interpreter mode",
    "Whole-stage codegen disabled for plan")

  private val maxKept = 50
  private val events = new ConcurrentLinkedQueue[String]()
  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var installed = false

  /** Idempotent; safe to call before or after SparkSession creation
    * (root-logger appenders survive `setLogLevel`, which only moves the
    * root LEVEL). */
  def install(): Unit = synchronized {
    if (installed) return
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val appender = new AbstractAppender(
      "graft-codegen-guard", null, null, false, Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit = {
        val msg =
          if (event.getMessage == null) null
          else event.getMessage.getFormattedMessage
        if (msg != null && markers.exists(msg.contains)) {
          counter.incrementAndGet()
          if (events.size < maxKept) {
            // first line only: the compile-failure event embeds the whole
            // generated class (tens of KB) after the headline
            events.add(
              event.getLoggerName + ": " + msg.linesIterator.next())
          }
        }
      }
    }
    appender.start()
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(appender, Level.WARN, null)
    ctx.updateLoggers()
    installed = true
  }

  def reset(): Unit = { events.clear(); counter.set(0) }

  def count: Int = counter.get()

  def captured: Seq[String] = {
    import scala.jdk.CollectionConverters._
    events.iterator().asScala.toSeq
  }

  /** One-line JSON fragment for bench/verify records. */
  def reportJson: String = {
    val lines = captured.take(10).map(s =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
    s"""{"codegen_fallbacks":$count,"events":$lines}"""
  }
}
