package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract runs
  * per-partition so a real decoder would amortize model/codec init across
  * a batch of rows.
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic fake features from the
  * bytes. The Spark-side contract — schema, partition-wise execution,
  * batch shape — is real and tested (MultimodalStubSpec).
  */
object MultimodalStub {

  /** Typed decode output. A real implementation would fill width/height
    * from the codec; the stub derives them from the payload hash. */
  case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      fingerprint: Long,
      width: Int,
      height: Int,
      ok: Boolean)

  /** Deterministic fake decoder: polynomial byte hash → pseudo dims.
    * Replace body with a real codec call (e.g. javax.imageio) when the
    * runtime ships one. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    if (bytes == null || bytes.isEmpty)
      return MediaFeatures(id, 0, 0L, 0, 0, ok = false)
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    MediaFeatures(id, bytes.length, h, (h % 640).toInt + 1, (h % 480).toInt + 1, ok = true)
  }

  /** Partition-wise feature extraction over (idCol: long, blobCol: binary).
    * mapPartitions (not per-row UDF) so a real decoder initializes once per
    * partition — the batch shape that matters at scale. */
  def extractFeatures(df: DataFrame, idCol: String, blobCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows: Iterator[Row] =>
      // per-partition init of a real codec would go here
      rows.map { r =>
        decodeStub(r.getLong(idIdx),
          if (r.isNullAt(blobIdx)) null else r.getAs[Array[Byte]](blobIdx))
      }
    }
  }

  /** documents table → (doc_id, blob) binary payload frame, the shape a
    * real media table would have. */
  def asBinaryTable(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), expr("encode(text, 'UTF-8')").as("blob"))

  /** Frame-sampling stub: one row per sampled "frame" — every `stride`-th
    * fixed-size byte window of the payload (a real video decoder would
    * emit decoded frames; the per-partition batch shape and the exploded
    * one-row-per-frame schema are what downstream code consumes). */
  case class Frame(media_id: Long, frame_idx: Int, offset: Int, n_bytes: Int,
      fingerprint: Long)

  def sampleFrames(df: DataFrame, idCol: String, blobCol: String,
      frameBytes: Int = 64, stride: Int = 4): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(blobIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](blobIdx)
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).zipWithIndex.map { case (f, i) =>
          val off = f * frameBytes
          var h = 0L
          var j = off
          while (j < off + frameBytes) {
            h = (h * 31 + (bytes(j) & 0xff)) % 1000000007L
            j += 1
          }
          Frame(id, i, off, frameBytes, h)
        }
      }
    }
  }

  /** Resize stub: deterministic downscale metadata (a real impl would
    * rescale pixels; the contract — preserved aspect ratio, bounded max
    * edge — is what this computes and tests lock down). */
  def resizeMeta(f: MediaFeatures, maxEdge: Int): (Int, Int) = {
    val scale = math.min(1.0, maxEdge.toDouble / math.max(f.width, f.height))
    (math.max(1, math.round(f.width * scale).toInt),
      math.max(1, math.round(f.height * scale).toInt))
  }
}
