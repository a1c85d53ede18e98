package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the perpetual 100 TB housekeeping operator:
  * streaming/incremental writers leave thousands of tiny parquet files
  * per partition; scans then pay per-file open/footer costs and the
  * driver pays listing costs. Compacting rewrites a directory into
  * ~targetBytes files.
  *
  * Sizing uses the actual on-disk bytes (Hadoop FS listing), not row
  * counts, so the result is stable across schema/compression changes.
  */
object Compaction {

  /** Total bytes of data files under `dir` (driver-side listing). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else
      fs.listStatus(p)
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .map(_.getLen).sum
  }

  def targetFileCount(totalBytes: Long, targetBytes: Long): Int =
    math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

  /** Rewrite `dir` into ~targetBytes parquet files at `outDir`. */
  def compact(spark: SparkSession, dir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val n = targetFileCount(dataBytes(spark, dir), targetBytes)
    spark.read.parquet(dir)
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    n
  }
}
