package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compact: many small files → sized file count, data preserved") {
    val dir = Files.createTempDirectory("graft-small").toString + "/frag"
    val out = Files.createTempDirectory("graft-compact").toString + "/out"
    // fragment: 32 files for a tiny table
    Tables(spark, sf("sf0.001"), "orders").repartition(32).write.parquet(dir)
    val before = spark.read.parquet(dir)
    assert(before.inputFiles.length === 32)

    val total = Compaction.dataBytes(spark, dir)
    assert(total > 0)
    val n = Compaction.compact(spark, dir, out, targetBytes = total / 2)
    assert(n === 2)
    val after = spark.read.parquet(out)
    assert(after.inputFiles.length === 2)
    assert(after.count() === before.count())
  }

  test("targetFileCount: ceil semantics with floor of 1") {
    assert(Compaction.targetFileCount(0L, 100L) === 1)
    assert(Compaction.targetFileCount(100L, 100L) === 1)
    assert(Compaction.targetFileCount(101L, 100L) === 2)
  }
}
