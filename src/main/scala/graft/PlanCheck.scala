package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries so the
  * shuffle/broadcast/pushdown structure can be reviewed (the "explain and
  * iterate" loop — run via `sbt "runMain graft.PlanCheck [names…]"`). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_join_broadcast_agg", "q_agg_groupsum", "q_topk",
        "q_self_role_join", "q_dedup_minhash_lsh", "q_asof_join")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
