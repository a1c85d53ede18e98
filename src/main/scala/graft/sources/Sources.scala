package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source operators (SURVEY.md §2.1 S1–S8) re-expressed Spark-first.
  *
  * The reference lands HTTP JSON to files, then loads with pandas; here
  * the landing dir is any Hadoop-compatible filesystem (local, s3a, …)
  * and reads are schema-explicit so bad documents fail fast instead of
  * silently inferring wrong types (ref risk: implicit pandas inference,
  * SURVEY.md §1.3).
  */
object Sources {

  /** S1/S3 — schema-explicit JSON load. `failFast=true` surfaces corrupt
    * rows as errors (FAILFAST); otherwise they become nulls (PERMISSIVE),
    * the pandas-lenient behavior. */
  def json(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("multiLine", true)
      .json(path)

  /** S3 at scale — schema-explicit LINE-DELIMITED JSON (one doc per line,
    * e.g. the partitioned fan-out landing of
    * [[HttpExtract.retrievePlayerDetailsJsonl]]). Splittable and
    * parallel — multiLine JSON parses each file on a single core. */
  def jsonl(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)

  /** S4 — dict-of-docs fan-out: a parent row with array<struct> children →
    * one child table, parent key injected (ref: per-player history/fixtures
    * stacking, etl/run_transform.py:246-254). `outer=false` (the ref's
    * concat semantics: empty array → no child rows); `outer=true` keeps
    * parents with empty arrays as a null child row. */
  def explodeChild(parent: DataFrame, parentKey: String, arrayCol: String,
      outer: Boolean = true): DataFrame = {
    val gen = if (outer) explode_outer(col(arrayCol)) else explode(col(arrayCol))
    val child = parent.select(col(parentKey), gen.as("__c"))
    val fields = child.select(col("__c.*")).columns
    child.select(col(parentKey) +: fields.map(f => col(s"__c.$f")): _*)
  }

  /** S5 — header CSV with explicit schema. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", true).schema(schema).csv(path)

  /** S7 — latest object by timestamp-suffixed name under a prefix (ref:
    * fpltools/utils.py:93-115 S3 latest-by-LastModified; here the run id
    * is encoded in the name, which is the idempotent cluster-safe form).
    * Listing happens driver-side via the Hadoop FS API — one RPC, no data
    * movement. */
  def latestByPrefix(spark: SparkSession, dir: String, prefix: String): Option[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val names = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith(prefix))
    if (names.isEmpty) None else Some(new Path(p, names.max).toString)
  }

  /** S8/K2 — parquet intermediate handoff (the ref's pickle). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** K3 — publish a landing file to a target filesystem under a
    * run-id-suffixed name (ref: fpltools/utils.py:26-61 S3 upload, with
    * retrieval by LastModified; encoding the run id IN the name instead is
    * idempotent and safe under eventual consistency, and works on any
    * Hadoop filesystem — local, hdfs, s3a). [[latestByPrefix]] is the
    * matching read side. */
  def publishWithRunId(spark: SparkSession, localFile: String, destDir: String,
      prefix: String, runId: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(conf)
    fs.mkdirs(dest)
    val src = new Path(localFile)
    val name = src.getName
    val ext = name.lastIndexOf('.') match {
      case -1 => ""
      case i => name.substring(i)
    }
    val out = new Path(dest, s"${prefix}_$runId$ext")
    org.apache.hadoop.fs.FileUtil.copy(
      src.getFileSystem(conf), src, fs, out, false, true, conf)
    out.toString
  }
}
