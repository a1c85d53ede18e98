package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.{IvfIndex, VectorIndex}
import graft.expressions.GraftExtensions

/** The streaming vector-ingest capstone: micro-batches assigned against
  * the frozen persisted quantizer, appended as deltas, decisions sunk
  * exactly-once — and the whole chain equal to one-shot assignment of
  * everything, replay included. */
class VectorIngestSpec extends SparkSpec {

  private def oneFileInto(df: org.apache.spark.sql.DataFrame, dir: String,
      name: String): Unit = {
    val tmp = Files.createTempDirectory("graft-vi-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, Paths.get(dir, name), StandardCopyOption.REPLACE_EXISTING)
  }

  test("streamed deltas equal one-shot frozen assignment; final index searchable; replay idempotent") {
    GraftExtensions.register(spark)
    val e = Tables(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val b1 = e.filter(col("vec_id") % 20 === 0)
    val b2 = e.filter(col("vec_id") % 20 === 10)

    val root = Files.createTempDirectory("graft-vi-root").toString
    val out = Files.createTempDirectory("graft-vi-out").toString + "/assign"
    VectorIndex.writeIvf(IvfIndex.buildLloyd(base, k = 4, iters = 2), s"$root/v0")

    val streamDir = Files.createTempDirectory("graft-vi-stream").toString
    oneFileInto(b1, streamDir, "batch-0001.parquet")
    oneFileInto(b2, streamDir, "batch-0002.parquet")
    val stream = spark.readStream
      .schema(b1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
    VectorIngest.start(root, out, stream).awaitTermination(180000)

    val seed = VectorIndex.loadIvf(spark, s"$root/v0")
    def assignMap(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cluster").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap

    // sink ≡ one-shot frozen assignment of both batches
    val sunk = spark.read.parquet(out)
    val sunkCount = sunk.count()
    assert(sunkCount === b1.count() + b2.count())
    val expected = assignMap(IvfIndex.assignFrozen(b1.unionByName(b2), seed.centers))
    assert(assignMap(sunk.select(col("vec_id"), col("cluster"))) === expected)

    // final version = base ∪ both batches, centroids untouched, searchable
    val vFinal = VectorIngest.loadVersion(spark, root, 2)
    assert(vFinal.centers.map(_._2.toSeq) === seed.centers.map(_._2.toSeq))
    assert(vFinal.assignments.count() === e.count())
    assert(vFinal.assignments.select("vec_id").distinct().count() === e.count())
    // capture BEFORE the replay overwrites delta2 in place — re-executing
    // this DataFrame afterwards would read deleted files
    val finalAssign = assignMap(vFinal.assignments)
    val probes = b2.limit(3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    assert(IvfIndex.search(vFinal, probes, topK = 5, nProbe = 4).count() > 0)

    // replay batch 1 (b2, batchId = 1): delta and sink land identically
    VectorIngest.processBatch(root, out)(b2, 1L)
    spark.catalog.refreshByPath(out)
    val replayed = spark.read.parquet(out)
    assert(replayed.count() === sunkCount, "replay duplicated sink rows")
    assert(assignMap(replayed.select(col("vec_id"), col("cluster"))) === expected)
    spark.catalog.refreshByPath(VectorIngest.deltaDir(root, 2))
    val replayedFinal = VectorIngest.loadVersion(spark, root, 2)
    assert(replayedFinal.assignments.count() === e.count())
    assert(assignMap(replayedFinal.assignments) === finalAssign)
  }

  test("checkpointed restart resumes at the first uncommitted batch with the same batch ids") {
    GraftExtensions.register(spark)
    val e = Tables(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val b1 = e.filter(col("vec_id") % 20 === 0)
    val b2 = e.filter(col("vec_id") % 20 === 10)

    val root = Files.createTempDirectory("graft-vi-ck-root").toString
    val out = Files.createTempDirectory("graft-vi-ck-out").toString + "/assign"
    val ckpt = Files.createTempDirectory("graft-vi-ckpt").toString
    VectorIndex.writeIvf(IvfIndex.buildLloyd(base, k = 4, iters = 2), s"$root/v0")

    val streamDir = Files.createTempDirectory("graft-vi-ck-stream").toString
    def mkStream = spark.readStream
      .schema(b1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
    def delta(v: Long) = Paths.get(VectorIngest.deltaDir(root, v))

    // run 1: only batch file 1 exists; AvailableNow drains it and stops —
    // the "crash" is the query ending with offsets committed to the
    // checkpoint
    oneFileInto(b1, streamDir, "batch-0001.parquet")
    VectorIngest.start(root, out, mkStream,
      checkpointLocation = Some(ckpt), queryName = Some("vi-restart"))
      .awaitTermination(180000)
    assert(spark.read.parquet(out).count() === b1.count())
    assert(Files.exists(delta(1)) && !Files.exists(delta(2)))

    // run 2 from the SAME checkpoint: only the new file is an
    // uncommitted offset, and it gets the NEXT batch id (1 → delta2) —
    // batch 0 is not reprocessed, the sink gains no duplicates
    oneFileInto(b2, streamDir, "batch-0002.parquet")
    VectorIngest.start(root, out, mkStream, checkpointLocation = Some(ckpt))
      .awaitTermination(180000)
    spark.catalog.refreshByPath(out)
    val sunk = spark.read.parquet(out)
    assert(sunk.count() === b1.count() + b2.count(),
      "restart duplicated or dropped sink rows")
    assert(sunk.select("vec_id").distinct().count() === sunk.count())
    assert(Files.exists(delta(2)), "resumed batch did not continue the id chain")
    assert(VectorIngest.loadVersion(spark, root, 2).assignments.count() ===
      base.count() + b1.count() + b2.count())
  }

  test("loadVersion: internal delta gap fails loudly; missing tail is fine") {
    GraftExtensions.register(spark)
    val e = Tables(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val root = Files.createTempDirectory("graft-vi-gap-root").toString
    val out = Files.createTempDirectory("graft-vi-gap-out").toString + "/assign"
    VectorIndex.writeIvf(IvfIndex.buildLloyd(base, k = 4, iters = 2), s"$root/v0")
    VectorIngest.processBatch(root, out)(e.filter(col("vec_id") % 20 === 0), 0L)
    VectorIngest.processBatch(root, out)(e.filter(col("vec_id") % 20 === 10), 1L)

    // tail beyond the applied chain: deltas 1..2 exist, upTo = 5 loads
    val tolerant = VectorIngest.loadVersion(spark, root, 5)
    assert(tolerant.assignments.count() === e.count())

    // internal gap: delta1 deleted while delta2 remains — refusing beats
    // serving an index that silently lost a batch
    val d1 = new org.apache.hadoop.fs.Path(VectorIngest.deltaDir(root, 1))
    d1.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(d1, true)
    val ex = intercept[IllegalStateException] {
      VectorIngest.loadVersion(spark, root, 2)
    }
    assert(ex.getMessage.contains("delta1"))
  }
}
