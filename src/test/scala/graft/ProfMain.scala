package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-job wall-time profiler (test scope, driver-side tooling): runs the
  * named queries to the noop sink under the Bench session conf and prints
  * each Spark job's wall time with its heaviest stages and task counts —
  * the signal that separates "exchange reused" from "pipeline silently
  * recomputed per consumer" and "32-way" from "file-split-bound" (the two
  * r14 decade findings). Usage:
  *   graft.ProfMain <sfDir> <q1,q2,...> [passes]
  */
object ProfMain {

  private object Meter extends SparkListener {
    val jobs = mutable.ArrayBuffer[(Int, Long, String)]()
    // stage wall + summed executor run/cpu time + max single task — the
    // per-stage truth the per-job walls can't resolve (round 15)
    val stages = mutable.ArrayBuffer[(Int, Int, Double, Double, Double, Double, String)]()
    private val starts = mutable.Map[Int, (Long, String)]()
    override def onJobStart(j: SparkListenerJobStart): Unit =
      starts(j.jobId) = (System.nanoTime(),
        j.stageInfos.map(s => s"${s.numTasks}t").mkString("+"))
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      starts.remove(j.jobId).foreach { case (t0, d) =>
        jobs.synchronized { jobs += ((j.jobId, System.nanoTime() - t0, d)) } }
    private val taskMax = mutable.Map[Int, Double]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) taskMax.synchronized {
        val ms = t.taskMetrics.executorRunTime.toDouble
        taskMax(t.stageId) = math.max(taskMax.getOrElse(t.stageId, 0.0), ms)
      }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val wall = (for { a <- si.completionTime; b <- si.submissionTime }
        yield (a - b) / 1e3).getOrElse(0.0)
      val m = si.taskMetrics
      stages.synchronized {
        stages += ((si.stageId, si.numTasks, wall,
          m.executorRunTime / 1e3, m.executorCpuTime / 1e9,
          taskMax.synchronized(taskMax.getOrElse(si.stageId, 0.0)) / 1e3,
          si.name.takeWhile(_ != '\n').take(60)))
      }
    }
    def reset(): Unit = {
      jobs.synchronized(jobs.clear()); starts.clear()
      stages.synchronized(stages.clear()); taskMax.synchronized(taskMax.clear())
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.checkpoint.compress", "true")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.codegen.cache.maxEntries", "10000") // r15: see Bench.scala
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(Meter)
    for (_ <- 1 to passes; name <- names) {
      Meter.reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      val js = Meter.jobs.synchronized(Meter.jobs.toVector)
      println(f"TOTAL $name $total%.2fs jobs=${js.size}")
      js.sortBy(-_._2).take(10).foreach { case (id, ns, d) =>
        println(f"  job $id%3d ${ns / 1e9}%7.2fs  stages=$d")
      }
      val ss = Meter.stages.synchronized(Meter.stages.toVector)
      println(f"  stages=${ss.size} wallSum=${ss.map(_._3).sum}%.2fs " +
        f"runSum=${ss.map(_._4).sum}%.2fs cpuSum=${ss.map(_._5).sum}%.2fs")
      ss.sortBy(-_._3).take(12).foreach {
        case (id, nt, wall, run, cpu, mx, nm) =>
          println(f"  stage $id%4d ${nt}%4dt wall=$wall%6.2fs run=$run%6.2fs " +
            f"cpu=$cpu%6.2fs maxTask=$mx%5.2fs  $nm")
      }
    }
    spark.stop()
  }
}
