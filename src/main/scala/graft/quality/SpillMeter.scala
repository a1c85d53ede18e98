package graft.quality

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Run-level spill/memory telemetry for bench records (VERDICT r11
  * item 4's evidence gap): "zero OOM under a squeezed heap" only proves
  * the spill paths were exercised if something actually SPILLED — a run
  * whose working set happened to fit would pass vacuously. Bench installs
  * this listener and records the totals in its JSON line, so the
  * constrained-memory records carry their own non-vacuity proof
  * (spill_mem_mb > 0) and ordinary runs document that they DIDN'T spill
  * (a regression that starts spilling at sf0.1 shows up as a nonzero
  * field, before it shows up as wall-clock).
  *
  * Totals are exact as of the last task-end event the async listener bus
  * has delivered; Bench reads them after the final action completes (any
  * straggler events are a rounding error on a whole-run total, unlike
  * per-query attribution, which is why per-query spill is deliberately
  * NOT reported).
  */
class SpillMeter extends SparkListener {
  private val memSpilled = new AtomicLong(0)
  private val diskSpilled = new AtomicLong(0)
  private val peakTaskMem = new AtomicLong(0)

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      memSpilled.addAndGet(m.memoryBytesSpilled)
      diskSpilled.addAndGet(m.diskBytesSpilled)
      peakTaskMem.accumulateAndGet(m.peakExecutionMemory, math.max(_, _))
      ()
    }
  }

  def memSpilledBytes: Long = memSpilled.get()
  def diskSpilledBytes: Long = diskSpilled.get()
  def peakTaskMemBytes: Long = peakTaskMem.get()

  private def mb(b: Long): Long = b / (1024 * 1024)

  /** JSON fragment for the bench record lines. */
  def reportJson: String =
    s""""spill_mem_mb":${mb(memSpilledBytes)},"spill_disk_mb":${mb(diskSpilledBytes)},"peak_task_mem_mb":${mb(peakTaskMemBytes)}"""
}
