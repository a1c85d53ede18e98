package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch experiment (test scope, not library code): does an explicit
  * persist of the adjacency frame beat relying on AQE exchange reuse in
  * q_pagerank? Runs each variant several times and prints the timings;
  * the winner gets pinned in PipelineQueries + PlanSpec. */
object PagerankExperiment {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders").foreach(t => Tables(spark, dir, t).count())

    def base(s: SparkSession): (DataFrame, DataFrame) = {
      val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
        .unionAll(pairs.select(col("p").as("src"), col("c").as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      (edges, deg)
    }

    def iterate(adj: DataFrame, deg: DataFrame): DataFrame = {
      var pr = deg.select(col("src").as("node"), lit(1000000000L).as("pr"))
      for (_ <- 1 to 3) {
        pr = adj.join(pr.hint("shuffle_hash"), adj("src") === pr("node"))
          .select(col("dst"), expr("pr div deg").as("contrib"))
          .groupBy(col("dst"))
          .agg(sum(col("contrib")).as("cs"))
          .select(col("dst").as("node"),
            expr("150000000L + (17 * cs) div 20").as("pr"))
      }
      pr.select(col("node"), col("pr"), (col("node") % 2).as("ntype"))
        .orderBy(col("pr").desc, col("node"))
        .limit(25)
    }

    def current(s: SparkSession): DataFrame = {
      val (edges, deg) = base(s)
      iterate(edges.join(deg.hint("shuffle_hash"), "src"), deg)
    }

    def persisted(s: SparkSession): DataFrame = {
      val (edges, deg) = base(s)
      val adj = edges.join(deg.hint("shuffle_hash"), "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
      iterate(adj, deg)
    }

    def time(label: String, fn: SparkSession => DataFrame, n: Int): Unit = {
      val ts = (1 to n).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        fn(spark).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-12s min=${ts.min}%.2f max=${ts.max}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // warmup both paths once
    current(spark).write.format("noop").mode("overwrite").save()
    persisted(spark).write.format("noop").mode("overwrite").save()
    spark.sharedState.cacheManager.clearCache()
    time("current", current, 7)
    time("persisted", persisted, 7)
    spark.stop()
  }
}
