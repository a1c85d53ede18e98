package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once OUTPUT on top of foreachBatch's at-least-once replay.
  *
  * foreachBatch re-delivers a batch when a failure lands between the
  * sink write and the checkpoint commit; a plain append sink then
  * duplicates that batch's rows. Keying the write by batch id and
  * replacing only that partition makes reprocessing idempotent: a retry
  * overwrites its own previous (possibly partial) output and nothing
  * else. This is the standard Spark recipe for exactly-once file/table
  * sinks without transactional storage.
  */
object IdempotentSink {

  /** Write `df` under `path` partitioned by `_batch_id`, dynamically
    * overwriting ONLY this batch's partition (earlier batches are
    * untouched). Safe to call any number of times per (df, batchId). */
  def replaceBatch(df: DataFrame, batchId: Long, path: String): Unit =
    df.withColumn("_batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(path)
}
