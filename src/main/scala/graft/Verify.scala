package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // zero-codegen-fallback gate: a Janino failure is only a log line to
    // Spark; here it fails the run (exit 3, AFTER all artifacts are
    // written) so an interpreted hot path can't ship silently again
    graft.quality.CodegenGuard.install()
    // SPARK_GRAFT_MASTER overrides the single-JVM default — used by the
    // distributed-execution parity gate (tools/distparity.sh) to run the
    // identical surface under local-cluster[n,c,m], where executors are
    // SEPARATE JVMs: real task/broadcast serialization, per-executor
    // codegen, cross-process shuffle — everything local[n] can't see.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      // Materialize.cut checkpoint files are reclaimed as their RDDs GC
      // (must be set before the context starts — ContextCleaner caches it)
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // reliable-checkpoint blocks (Materialize.cut) compress with the
      // session codec: Spark defaults this OFF, and an uncompressed cut
      // of a corpus-sized frame was the visible recoverability premium
      // at 10x (VERDICT r13 item 1)
      .config("spark.checkpoint.compress", "true")
      // text/embedding parquet is tiny on disk but CPU-dense to process
      // (compressed text explodes ~20x into tokenize/hash work): the
      // default 4 MiB file-open cost floors split sizes so a 6 MiB
      // documents table scans with 2 tasks on 32 cores. 128 KiB keeps
      // bytes/defaultParallelism in charge for small inputs; at real
      // scale splits are maxPartitionBytes-bound, so this is a no-op
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.codegen.cache.maxEntries", "10000") // r15: see Bench.scala
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated subset, for targeted correctness iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/codegen_guard.json"),
      graft.quality.CodegenGuard.reportJson)
    spark.stop()
    if (graft.quality.CodegenGuard.count > 0) {
      System.err.println(
        s"[verify] CODEGEN GUARD TRIPPED (${graft.quality.CodegenGuard.count} events) — " +
          "a generated-code compile failure fell back to interpreter mode:")
      graft.quality.CodegenGuard.captured.take(10)
        .foreach(l => System.err.println(s"[verify]   $l"))
      sys.exit(3)
    }
  }
}
