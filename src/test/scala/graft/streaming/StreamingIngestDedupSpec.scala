package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.DedupIndex

/** The streaming form of the persisted near-dup index: two micro-batches
  * of new documents, each extending the previous index VERSION, must land
  * on exactly the cluster assignment a full rebuild over everything
  * produces — with cross-batch near-dup merges included. */
class StreamingIngestDedupSpec extends SparkSpec {

  private def oneFileInto(df: org.apache.spark.sql.DataFrame, dir: String,
      name: String): Unit = {
    val tmp = Files.createTempDirectory("graft-sid-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, Paths.get(dir, name), StandardCopyOption.REPLACE_EXISTING)
  }

  test("chained micro-batch index updates equal the full rebuild (cross-batch merges included)") {
    val dir = sf("sf0.001")
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    // three slices; slices 1 and 2 carry 1-token-tail near-copies of
    // EARLIER slices' docs, so merges must happen across micro-batches
    val p0 = docs.filter(col("doc_id") % 3 === 0)
    val p1Base = docs.filter(col("doc_id") % 3 === 1)
    val p1 = p1Base.unionByName(
      p0.filter(col("doc_id") % 30 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text")))
    val p2 = docs.filter(col("doc_id") % 3 === 2).unionByName(
      p1Base.filter(col("doc_id") % 30 === 1)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text")))

    val root = Files.createTempDirectory("graft-sid-root").toString
    DedupIndex.write(DedupIndex.buildFrames(spark, p0),
      StreamingIngestDedup.versionDir(root, 0))

    val streamDir = Files.createTempDirectory("graft-sid-stream").toString
    oneFileInto(p1, streamDir, "batch-0001.parquet")
    oneFileInto(p2, streamDir, "batch-0002.parquet")

    val stream = spark.readStream
      .schema(p1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
    val q = StreamingIngestDedup.start(root, stream)
    q.awaitTermination(180000)

    assert(Files.exists(Paths.get(StreamingIngestDedup.versionDir(root, 2))),
      "expected two micro-batches to produce versions v1 and v2")
    assert(!Files.exists(Paths.get(StreamingIngestDedup.versionDir(root, 3))))

    val all = p0.unionByName(p1).unionByName(p2)
    val ids = all.select(col("doc_id"))
    val streamedIx = DedupIndex.load(spark, StreamingIngestDedup.versionDir(root, 2))
    val got = DedupIndex.assign(ids, streamedIx.labels)
      .orderBy(col("doc_id")).collect().toSeq
    val rebuilt = DedupIndex.assign(ids,
        DedupIndex.buildFrames(spark, all).labels)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got === rebuilt)

    // non-vacuous: a batch-1 injected copy really merged with its p0
    // original (cross-batch), and a batch-2 copy with its p1 original
    val assignMap = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b1Pairs = assignMap.keys.filter(id => id >= 10000 && id < 20000)
    assert(b1Pairs.nonEmpty)
    b1Pairs.foreach(id => assert(assignMap(id) === assignMap(id - 10000),
      s"injected $id not merged with its original"))
    val b2Pairs = assignMap.keys.filter(_ >= 20000)
    assert(b2Pairs.nonEmpty)
    b2Pairs.foreach(id => assert(assignMap(id) === assignMap(id - 20000),
      s"injected $id not merged with its original"))
  }
}
