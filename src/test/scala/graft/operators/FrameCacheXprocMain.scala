package graft.operators

import org.apache.spark.sql.SparkSession

/** Forked-JVM worker for [[FrameCacheXprocSpec]]: one `ensure` call
  * against the root in SPARK_GRAFT_INDEX_DIR.
  *
  * args: <key> <sentinel> <mode>
  *  - mode `build`      — build a one-row frame carrying <sentinel>,
  *                        sleeping 3 s inside the build so two workers
  *                        started together genuinely overlap;
  *  - mode `read`       — the build thunk THROWS: proves the asset is
  *                        served cross-process without rebuilding.
  *
  * Prints `VALUE=<v> BUILT=<0|1>` for the spec to parse; exits 1 on any
  * failure.
  */
object FrameCacheXprocMain {
  def main(args: Array[String]): Unit = {
    val Array(key, sentinel, mode) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    var built = 0
    try {
      val frames = FrameCache.ensure(spark, key) {
        if (mode == "read") sys.error("read mode must not build")
        built = 1
        Thread.sleep(3000) // force overlap between racing workers
        Seq("t" -> Seq(sentinel.toLong).toDF("v"))
      }
      val v = frames("t").head().getLong(0)
      println(s"VALUE=$v BUILT=$built")
      spark.stop()
    } catch {
      case e: Throwable =>
        System.err.println(s"xproc worker failed: $e")
        spark.stop()
        sys.exit(1)
    }
  }
}
