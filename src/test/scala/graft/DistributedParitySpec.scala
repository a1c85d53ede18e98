package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed-EXECUTION parity gate (round 12). Every other gate in
  * this repo runs Spark as `local[n]` — one JVM, where tasks share the
  * driver's heap: closure/broadcast serialization, per-executor codegen
  * compilation and cross-process shuffle fetch are never exercised, so
  * a custom Expression holding non-serializable state (or a plan that
  * depends on shared-JVM object identity) is invisible to all of them.
  *
  * This spec forks graft.Verify twice over the SAME serialization-risk
  * query subset — once under `local[4]`, once under
  * `local-cluster[2,2,1024]` (Spark's in-box standalone master whose
  * executors are SEPARATE JVMs, launched from SPARK_HOME with the graft
  * classes arriving via spark.executor.extraClassPath) — and asserts the
  * outputs are row-identical and both runs survived the codegen guard.
  * The subset covers each native-expression family that ships state to
  * executors: FloatDotProduct (the r11 defect shape), JlProjectExpr's
  * projection matrix, FloatRpBands' plane table, TokenSetRatioExpr,
  * TokenSimHash60 + Manku band keys, BloomMightContain's broadcast
  * sketch literal, a FrameCache-published LSH index read back from a
  * fresh process, and a plain broadcast-hash join as the control.
  *
  * The full 195-query surface was run under local-cluster[4,4,2048] at
  * sf0.001 AND sf0.01 against the DuckDB oracle when this gate landed
  * (195/195 green, 0 codegen fallbacks — tools/distparity.sh reproduces
  * it); this spec keeps the property alive per-test-run at subset scale.
  */
class DistributedParitySpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private val subset = Seq(
    "q_auc_exact",        // graft_fdot centroid self-norm (r11 defect shape)
    "q_jl_projection",    // JlProjectExpr (per-expression projection matrix)
    "q_ann_lsh",          // FloatRpBands + FrameCache-persisted index
    "q_token_set_scores", // TokenSetRatioExpr codegen kernel
    "q_simhash_pairs",    // TokenSimHash60 + Manku block-permutation joins
    "q_bloom_prefilter",  // BloomMightContain: sketch rides the plan as a literal
    "q_dedup_minhash_lsh",// winhash shingles + banded index via FrameCache
    "q_join_broadcast_agg"// plain broadcast-hash join control
  )

  private def fork(master: String, outDir: String, indexDir: String): (Int, String) =
    ClusterFork.verify(master, sfDir, outDir, indexDir, subset)

  test("serialization-risk subset is row-identical between local[4] and multi-JVM local-cluster[2,2,1024]") {
    val outLocal = Files.createTempDirectory("dp-local").toString
    val outClust = Files.createTempDirectory("dp-clust").toString
    val (c1, o1) = fork("local[4]", outLocal,
      Files.createTempDirectory("dp-idx-l").toString)
    assert(c1 === 0, s"local[4] Verify failed (exit $c1):\n${o1.takeRight(4000)}")
    val (c2, o2) = fork("local-cluster[2,2,1024]", outClust,
      Files.createTempDirectory("dp-idx-c").toString)
    assert(c2 === 0, s"local-cluster Verify failed (exit $c2):\n${o2.takeRight(4000)}")

    // exit 0 already proves the codegen guard saw zero fallbacks (it
    // exits 3 otherwise); the report files pin it explicitly
    for (d <- Seq(outLocal, outClust)) {
      val rep = Files.readString(java.nio.file.Paths.get(s"$d/codegen_guard.json"))
      assert(rep.contains("\"codegen_fallbacks\":0"), s"codegen fallback in $d: $rep")
    }

    val spark = SparkSpec.session
    subset.foreach { q =>
      val a = spark.read.parquet(s"$outLocal/$q")
      val b = spark.read.parquet(s"$outClust/$q")
      assert(a.schema === b.schema, s"$q: schema diverged under cluster execution")
      val cols = a.columns.toSeq.map(col)
      val rowsA = a.sort(cols: _*).collect().toSeq
      val rowsB = b.sort(cols: _*).collect().toSeq
      assert(rowsA.size === rowsB.size, s"$q: row count diverged")
      assert(rowsA === rowsB, s"$q: rows diverged between local and multi-JVM execution")
      assert(rowsA.nonEmpty, s"$q: empty result makes this gate vacuous")
    }
  }
}
