package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materializes a deterministic corpus shuffle (see q_corpus_shuffle) as
  * SORTED per-shard parquet — the physical training-export artifact a
  * data loader streams sequentially: one directory per shard, file order
  * inside each directory IS the shuffle order.
  *
  * Execution shape: one hash repartition on the shard key co-locates each
  * shard's rows (shard count is chosen ≈ cluster parallelism, so this is
  * the job's natural fan-out, not a bottleneck), then
  * `sortWithinPartitions(shard, pos)` orders rows WITHOUT a global sort —
  * the permutation was already computed scalably by [[GlobalRowNumber]];
  * this stage only lays it out. `partitionBy(shard)` gives the
  * `shard=K/part-*.parquet` layout; because every task's rows arrive
  * shard-contiguous and pos-sorted, each written file is internally
  * pos-sorted and shard directories never interleave ranges across
  * files from the same task.
  */
object ShardedExport {

  def write(df: DataFrame, path: String, nShards: Int,
      shardCol: String = "shard", posCol: String = "pos"): Unit = {
    df.repartition(nShards, col(shardCol))
      .sortWithinPartitions(col(shardCol), col(posCol))
      .write.mode("overwrite").partitionBy(shardCol).parquet(path)
  }
}
