package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The checkpoint-dir decision behind [[Materialize.cut]] (ADVICE r12,
  * both medium items): the exit sweep may only ever target the
  * auto-created per-app tmpdir — a user-supplied SPARK_GRAFT_CKPT_DIR is
  * a shared root (Spark nests each app in a UUID subdir of it), so
  * sweeping it on exit would wipe concurrent apps' live checkpoints —
  * and a non-local master with no configured dir must fail LOUDLY at
  * the first cut instead of silently checkpointing to the driver-local
  * tmpdir (whose partition files would scatter across executor-local
  * filesystems and fail on read).
  */
class MaterializeSpec extends AnyFunSuite {

  test("env-provided checkpoint dir is never marked for the exit sweep, any scheme") {
    for (dir <- Seq("/mnt/nfs/ckpt", "file:/mnt/shared/ckpt",
        "hdfs://nn/ckpt", "s3a://bucket/ckpt", "abfs://c@a.dfs/ckpt",
        "gs://bucket/ckpt")) {
      val (resolved, sweep) =
        Materialize.resolveCheckpointDir(Some(dir), isLocal = true, "app-1")
      assert(resolved === dir)
      assert(!sweep, s"user-supplied dir $dir would be rm'd on JVM exit")
      // a cluster master trusts the user's dir the same way
      val (r2, s2) =
        Materialize.resolveCheckpointDir(Some(dir), isLocal = false, "app-1")
      assert(r2 === dir && !s2)
    }
  }

  test("auto-created local dir embeds the app id and is swept on exit") {
    val (dir, sweep) =
      Materialize.resolveCheckpointDir(None, isLocal = true, "app-42")
    assert(sweep, "the auto tmpdir is ours to clean")
    assert(dir.contains("app-42"), "per-app dir, no cross-app collision")
    assert(dir.startsWith(System.getProperty("java.io.tmpdir")),
      s"auto dir must live under java.io.tmpdir, got $dir")
  }

  test("non-local master with no checkpoint dir fails fast, naming the env var") {
    val e = intercept[IllegalStateException] {
      Materialize.resolveCheckpointDir(None, isLocal = false, "app-1")
    }
    assert(e.getMessage.contains("SPARK_GRAFT_CKPT_DIR"),
      "the error must point at the fix")
  }
}
