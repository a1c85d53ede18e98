package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The physical training-export artifact: the q_corpus_shuffle
  * permutation written as sorted per-shard parquet, with balance,
  * completeness, and in-file order proven by reading the files back. */
class ShardedExportSpec extends SparkSpec {

  private val nShards = 8

  private def shuffled = {
    val d = Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"))
      .withColumn("hkey", expr("doc_id % 1000000007 * 2654435761 % 1000000007"))
    GlobalRowNumber.withRowNumber(d, "hkey", "rn", Seq("doc_id"))
      .withColumn("shard", ((col("rn") - 1) % nShards).cast("int"))
      .withColumn("pos", expr(s"(rn - 1) div $nShards"))
      .select(col("doc_id"), col("hkey"), col("shard"), col("pos"))
  }

  test("sharded export: balanced, complete, and pos-sorted within every file") {
    val dir = Files.createTempDirectory("graft-shards").toString
    val src = shuffled.cache()
    try {
      val n = src.count()
      ShardedExport.write(src, dir, nShards)

      // every shard directory exists and carries exactly n/8 ±1 rows
      val back = spark.read.parquet(dir)
      val counts = back.groupBy(col("shard")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(counts.keySet === (0 until nShards).toSet)
      assert(counts.values.max - counts.values.min <= 1,
        s"shard imbalance: $counts")
      assert(counts.values.sum === n)

      // round trip: (doc_id, shard, pos) read back equals the computed
      // permutation exactly — nothing lost, duplicated, or reassigned
      val diff = back.select(col("doc_id"), col("shard"), col("pos"))
        .exceptAll(src.select(col("doc_id"), col("shard"), col("pos")))
      assert(diff.isEmpty)

      // in-file order IS the shuffle order: within every physical file,
      // pos strictly increases in row order (no cross-file range
      // interleave from one task, no unsorted file a sequential loader
      // would have to re-sort)
      val files = back.select(input_file_name().as("f")).distinct()
        .collect().map(_.getString(0))
      assert(files.nonEmpty)
      files.foreach { f =>
        val pos = spark.read.parquet(f).select(col("pos"))
          .collect().map(_.getLong(0))
        assert(pos.sameElements(pos.sorted), s"file not pos-sorted: $f")
      }
    } finally {
      src.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
