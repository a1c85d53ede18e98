package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{IvfIndex, VectorIndex}

/** Streaming VECTOR ingest — the ANN twin of [[CurationPipeline]]: new
  * embedding micro-batches are assigned against the FROZEN persisted
  * quantizer ([[VectorIndex.addIvf]], FAISS IndexIVF.add semantics) and
  * land APPEND-ONLY.
  *
  * Layout under `root` (the production shape — the corpus vector table
  * is never rewritten per batch):
  *
  *  - `v0/` — the seed index ([[VectorIndex.writeIvf]]: centroids +
  *    base vectors), written once by the caller;
  *  - `delta{b+1}/` — micro-batch b's assigned vectors, one parquet
  *    directory per batch. The index "as of batch b" is centroids +
  *    v0/vectors ∪ delta1..b — a multi-path parquet scan, exactly how a
  *    vector store accumulates segments between quantizer retrains.
  *
  * Because the quantizer is frozen, per-batch assignment is
  * ORDER-INDEPENDENT: the chain of N micro-batches lands on the
  * identical final index as one-shot assignment of all N batches —
  * VectorIngestSpec proves it, replay included. Exactly-once comes from
  * the same discipline as the rest of the streaming family: batch b
  * reads only immutable inputs (centroids + its own rows) and
  * idempotently overwrites only its own outputs (`delta{b+1}` and its
  * `_batch_id` sink partition).
  *
  * Scale shape per micro-batch: one broadcast of the driver-tiny
  * centroid table against the batch — no corpus scan, no shuffle of
  * anything corpus-sized, ever.
  */
object VectorIngest {

  def deltaDir(root: String, v: Long): String = s"$root/delta$v"

  /** The index as of `upTo` applied batches: frozen centroids from v0 +
    * the base vectors and every delta ≤ upTo. A missing TRAILING delta
    * is fine (fewer batches have landed than asked for); an INTERNAL
    * gap — delta d absent while some delta d' > d exists — means a
    * batch's vectors were lost or deleted, and silently unioning around
    * it would serve an index that is missing data while claiming
    * version `upTo`. That is corruption, not laziness: fail loudly. */
  def loadVersion(spark: SparkSession, root: String, upTo: Long): IvfIndex.Index = {
    val seed = VectorIndex.loadIvf(spark, s"$root/v0")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val present = (1L to upTo).map(v => v -> fs.exists(new Path(deltaDir(root, v))))
    val lastPresent = present.collect { case (v, true) => v }.lastOption.getOrElse(0L)
    val gaps = present.collect { case (v, false) if v < lastPresent => v }
    if (gaps.nonEmpty)
      throw new IllegalStateException(
        s"delta chain under $root has internal gaps: missing " +
          gaps.map(deltaDir(root, _)).mkString(", ") +
          s" while ${deltaDir(root, lastPresent)} exists — " +
          "the index would silently drop those batches' vectors")
    val deltas = present.collect { case (v, true) => deltaDir(root, v) }
    if (deltas.isEmpty) seed
    else IvfIndex.Index(seed.centers,
      seed.assignments.unionByName(spark.read.parquet(deltas: _*)))
  }

  /** One micro-batch: assign against the frozen quantizer, sink the
    * (vec_id, cluster) decisions exactly-once, append the delta.
    * Factored out so a spec (or manual recovery) can replay a batch. */
  def processBatch(root: String, outPath: String)
      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // only the centroids matter for the add — earlier deltas are not read
    val seed = VectorIndex.loadIvf(spark, s"$root/v0")
    val added = VectorIndex.addIvf(spark, seed, batch)
    // delta first, sink from its read-back: the assignment executes ONCE
    // and sink/delta can never diverge (a lazy `added` reused for both
    // writes would recompute the broadcast-assign per write)
    val delta = deltaDir(root, batchId + 1)
    added.write.mode("overwrite").parquet(delta)
    // a REPLAYED batch overwrites its delta in place — drop any cached
    // file listing before re-reading it for the sink
    spark.catalog.refreshByPath(delta)
    IdempotentSink.replaceBatch(
      spark.read.parquet(delta).select("vec_id", "cluster"), batchId, outPath)
  }

  /** Start the ingest: `stream` must carry (vec_id, embedding). The
    * caller seeds `v0` (see [[VectorIndex.writeIvf]]).
    *
    * Exactly-once across JVM CRASHES requires `checkpointLocation`: the
    * checkpoint is where Structured Streaming persists source offsets,
    * so a restarted query resumes at the first uncommitted batch with
    * the SAME batch ids and [[processBatch]]'s idempotent writes land
    * on the same delta/sink partitions. Without it (None — ad-hoc/test
    * runs) offsets live only in memory: replay-idempotence still holds
    * within one run, but a crash restarts the stream from scratch with
    * fresh batch ids, and that contract is on the CALLER. */
  def start(root: String, outPath: String, stream: DataFrame,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpointLocation: Option[String] = None,
      queryName: Option[String] = None): StreamingQuery = {
    val w0 = stream.writeStream
      .foreachBatch(processBatch(root, outPath) _)
      .trigger(trigger)
    val w1 = checkpointLocation.fold(w0)(w0.option("checkpointLocation", _))
    queryName.fold(w1)(w1.queryName).start()
  }
}
