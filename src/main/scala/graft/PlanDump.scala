package graft

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostics main (not part of the driver contract). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      val df = SparkEntry.queries(q)(spark, args(0))
      println(s"==== $q ====")
      df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
