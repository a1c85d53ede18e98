package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The generic named-frame ensure cache: builds once per key, serves
  * parquet read-backs that equal the built frames, and keeps names
  * stable across calls. */
class FrameCacheSpec extends SparkSpec {
  import spark.implicits._

  test("builds once per key; read-backs equal the built frames by name") {
    var builds = 0
    val key = s"spec#fc#${System.nanoTime()}"
    def ensure() = FrameCache.ensure(spark, key) {
      builds += 1
      val a = (1L to 100L).toDF("x").withColumn("y", col("x") * 2)
      val b = (1L to 10L).toDF("k")
      Seq("big" -> a, "small" -> b)
    }
    val f1 = ensure()
    val f2 = ensure()
    assert(builds === 1)
    assert(f1.keySet === Set("big", "small") && f2.keySet === f1.keySet)
    val got = f2("big").orderBy(col("x")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === (1L to 100L).map(x => (x, x * 2)))
    assert(f2("small").count() === 10L)
  }

  test("distinct keys build independently") {
    var builds = 0
    def ensure(key: String) = FrameCache.ensure(spark, key) {
      builds += 1
      Seq("t" -> Seq(builds).toDF("b"))
    }
    val k = System.nanoTime()
    val a = ensure(s"spec#fc1#$k")("t").head.getInt(0)
    val b = ensure(s"spec#fc2#$k")("t").head.getInt(0)
    assert(builds === 2 && a === 1 && b === 2)
  }

  test("a failed build caches nothing and cleans its partial dir; the retry rebuilds") {
    val key = s"spec#fcfail#${System.nanoTime()}"
    var attempts = 0
    def ensure(fail: Boolean) = FrameCache.ensure(spark, key) {
      attempts += 1
      val ok = Seq("good" -> (1L to 5L).toDF("x"))
      if (fail)
        // fail AFTER the first frame wrote: the partial dir must go away
        ok :+ ("bad" -> spark.sql("SELECT raise_error('boom') AS x"))
      else ok
    }
    val before = new java.io.File(FrameCache.root).list().toSet
    intercept[Exception] { ensure(fail = true) }
    // nothing cached, no orphan build dir left behind
    assert(new java.io.File(FrameCache.root).list().toSet === before)
    val got = ensure(fail = false)
    assert(attempts === 2, "failed build was cached")
    assert(got("good").count() === 5L)
  }

  test("two different keys build CONCURRENTLY (per-key locks, no global serialization)") {
    // build A blocks until build B has started: under the old JVM-global
    // lock this deadlocks-by-timeout; with per-key locks both proceed
    val k = System.nanoTime()
    val bStarted = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      FrameCache.ensure(spark, s"spec#fcc-b#$k") {
        bStarted.countDown()
        Seq("t" -> Seq(1).toDF("b"))
      }
      ()
    })
    @volatile var bStartedWhileAHeld = false
    val a = new Thread(() => {
      FrameCache.ensure(spark, s"spec#fcc-a#$k") {
        t.start()
        // A's build WAITS for B's build to begin — only possible if B's
        // ensure is not queued behind A's lock
        bStartedWhileAHeld =
          bStarted.await(30, java.util.concurrent.TimeUnit.SECONDS)
        Seq("t" -> Seq(2).toDF("b"))
      }
      ()
    })
    a.start(); a.join(60000); t.join(60000)
    assert(!a.isAlive && !t.isAlive)
    assert(bStartedWhileAHeld,
      "key B's build never started while key A held its build lock")
  }

  test("ensure() and ensureDir() with the SAME key resolve to DIFFERENT assets") {
    // ADVICE r11: the two APIs publish structurally different assets (an
    // ensureDir marker lists no frame names); before the API-kind fold in
    // assetId, the same key string through both resolved to one on-disk
    // dir and ensure() silently returned an EMPTY frame map from an
    // ensureDir-published marker instead of building.
    val key = s"spec#fckind#${System.nanoTime()}"
    val dir = FrameCache.ensureDir(key) { stg =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$stg/payload.txt"), "dir-api")
      ()
    }
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/payload.txt")))
    var built = false
    val frames = FrameCache.ensure(spark, key) {
      built = true
      Seq("t" -> Seq(7).toDF("b"))
    }
    assert(built,
      "ensure() served an ensureDir-published asset for the same key — " +
        "the API namespaces collided")
    assert(frames.keySet === Set("t") && frames("t").head.getInt(0) === 7)
  }
}
