package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once cache of NAMED parquet frames — the generic form of the
  * [[DedupIndex.ensure]] / [[VectorIndex.ensureIvf]] pattern, for derived
  * corpus assets that several queries share but that don't carry index
  * semantics of their own (e.g. the inverted-index retrieval core:
  * enriched postings + query terms + idf dictionary, consumed by BM25,
  * RRF fusion and hard-negative mining).
  *
  * The first caller for `key` runs `build` and persists every returned
  * frame as parquet; every caller — including the builder — consumes the
  * read-back. Paths (not DataFrames) are cached, so a later caller's own
  * session does the read. At 100 TB the parquet form IS the production
  * artifact — a maintained postings table a scheduled job refreshes, not
  * a per-query rebuild.
  *
  * CROSS-PROCESS build-once (round-11): asset identity is deterministic
  * — `sha1(key + sourceStamp + buildToken)` — and publication is
  * ATOMIC-RENAME:
  * builders write into a private staging dir under [[root]], stamp a
  * completion marker (listing the frame names), then rename staging →
  * final. Rename is atomic on a POSIX filesystem, so a concurrently
  * racing JVM either wins the rename or loses it cleanly (the final dir
  * it then reads was renamed WHOLE — never a torn asset). Exactly one
  * build per asset across any number of JVMs sharing the root; the loser
  * deletes its own staging.
  *
  * OBJECT-STORE PUBLISH (round-14, the rename-less seam): when [[root]]
  * carries a URI scheme (`s3a:`, or the specs' registered mock schemes),
  * rename is not atomic — S3's is copy+delete — so publication switches
  * to POINTER-COMMIT: each builder writes its frames into a PRIVATE
  * `asset-<id>/attempt-<uuid>/` prefix, then CONDITIONALLY PUTS the
  * completion marker at `asset-<id>/_GRAFT_COMPLETE` naming its attempt
  * (`#dir:attempt-<uuid>`). The conditional put — `FileSystem.create(
  * path, overwrite = false)`, the surface S3 backs with `If-None-Match`
  * and HDFS with atomic create — is the single arbitration point:
  * exactly one racing builder's marker lands; losers read the winner's
  * pointer and delete their own attempt. Readers NEVER list — they
  * follow the marker's pointer — so a half-written attempt (crashed
  * builder, concurrent loser) is unreachable, not a torn read; orphaned
  * attempt prefixes are invisible garbage for the store's lifecycle
  * rules (the local-root janitor [[gcStaging]] does not run on object
  * roots). The build lease rides the same conditional put, with
  * heartbeat = re-PUT of the lease object (object stores don't expose
  * mtime touch) and staleness read from the object's modification time.
  *
  * Freshness across processes: keys follow the `<sourceDir>#<asset>`
  * convention, and [[sourceStamp]] of the part before '#' (file names,
  * lengths, mtimes) is folded into the asset id. Regenerated source data
  * at the same path therefore yields a NEW asset id and a rebuild — the
  * old per-JVM-rebuild freshness guarantee, kept without giving up
  * cross-process reuse. A key with no '#' (or a non-path prefix) gets an
  * empty stamp and still dedups on the key alone. [[buildToken]] folds
  * the compiled library's own fingerprint in as well, so a CODE change
  * to a builder (which touches no source data and no key) also yields a
  * new asset id instead of silently serving an asset built by old code.
  */
object FrameCache {

  private val marker = "_GRAFT_COMPLETE"

  /** The five atomic points the resolve protocol needs from storage.
    * [[NioStore]] is the POSIX root (exclusive create + mtime);
    * [[HadoopStore]] is any scheme'd root (conditional PUT + object
    * modification time). Everything else in the protocol is identical. */
  private[operators] sealed trait CacheStore {
    /** All-or-nothing create-if-absent with content; false = already
      * exists (someone else won). The object-store PUT-with-If-None-Match
      * surface. */
    def putExclusive(p: String, content: String): Boolean
    /** Refresh the liveness signal [[lastModMs]] reads. */
    def heartbeat(p: String): Unit
    def lastModMs(p: String): Long
    def readLinesOpt(p: String): Option[Seq[String]]
    def deleteQuiet(p: String): Unit
    def mkdirs(p: String): Unit
    /** Best-effort read-lease touch (no-op where touching means a
      * rewrite that could race the conditional-put arbitration). */
    def touchQuiet(p: String): Unit
  }

  private object NioStore extends CacheStore {
    def putExclusive(p: String, content: String): Boolean =
      try {
        Files.createFile(Paths.get(p)) // atomic-exclusive on POSIX
        Files.write(Paths.get(p), content.getBytes(StandardCharsets.UTF_8))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    def heartbeat(p: String): Unit =
      try Files.setLastModifiedTime(Paths.get(p),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      catch { case scala.util.control.NonFatal(_) => () }
    def lastModMs(p: String): Long =
      Files.getLastModifiedTime(Paths.get(p)).toMillis
    def readLinesOpt(p: String): Option[Seq[String]] =
      if (Files.exists(Paths.get(p)))
        Some(Files.readAllLines(Paths.get(p), StandardCharsets.UTF_8).asScala.toSeq)
      else None
    def deleteQuiet(p: String): Unit =
      try { Files.deleteIfExists(Paths.get(p)); () }
      catch { case scala.util.control.NonFatal(_) => () }
    def mkdirs(p: String): Unit = { Files.createDirectories(Paths.get(p)); () }
    def touchQuiet(p: String): Unit = heartbeat(p)
  }

  /** Scheme'd roots resolve through the Hadoop FileSystem registry —
    * the `fs.<scheme>.impl` mechanism every object-store connector
    * uses. Conditional put maps to `create(path, overwrite = false)`
    * (S3 `If-None-Match`, HDFS atomic create; the specs' mock scheme
    * emulates the PUT-at-close semantics); heartbeat re-PUTs the lease
    * object so its modification time advances. */
  private final class HadoopStore extends CacheStore {
    private def conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    private def fsPath(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      (hp.getFileSystem(conf), hp)
    }
    def putExclusive(p: String, content: String): Boolean =
      try {
        val (fs, hp) = fsPath(p)
        val out = fs.create(hp, false)
        try out.write(content.getBytes(StandardCharsets.UTF_8))
        finally out.close() // stores with PUT-at-close arbitrate HERE
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
        case e: java.io.IOException
            if e.getMessage != null && e.getMessage.contains("exists") => false
      }
    def heartbeat(p: String): Unit =
      try {
        val (fs, hp) = fsPath(p)
        val out = fs.create(hp, true)
        try out.write(System.currentTimeMillis().toString
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
      } catch { case scala.util.control.NonFatal(_) => () }
    def lastModMs(p: String): Long = {
      val (fs, hp) = fsPath(p)
      fs.getFileStatus(hp).getModificationTime
    }
    def readLinesOpt(p: String): Option[Seq[String]] = {
      val (fs, hp) = fsPath(p)
      if (!fs.exists(hp)) None
      else {
        val len = fs.getFileStatus(hp).getLen.toInt
        val buf = new Array[Byte](len)
        val in = fs.open(hp)
        try in.readFully(0, buf) finally in.close()
        Some(new String(buf, StandardCharsets.UTF_8).linesIterator.toSeq)
      }
    }
    def deleteQuiet(p: String): Unit =
      try { val (fs, hp) = fsPath(p); fs.delete(hp, true); () }
      catch { case scala.util.control.NonFatal(_) => () }
    def mkdirs(p: String): Unit = { val (fs, hp) = fsPath(p); fs.mkdirs(hp); () }
    def touchQuiet(p: String): Unit = () // a rewrite is a PUT — never race it
  }

  /** A root like `s3a://bucket/prefix` or the specs' `mock:/...` is an
    * object-store root; a bare path (or `file:`) is POSIX. */
  private[operators] def isObjectRoot(r: String): Boolean = {
    val m = "^([a-zA-Z][a-zA-Z0-9+.-]*):/.*$".r
    r match {
      case m(scheme) => scheme != "file"
      case _ => false
    }
  }

  private def storeFor(r: String): CacheStore =
    if (isObjectRoot(r)) new HadoopStore else NioStore

  // in-JVM memo of resolved asset dirs (ensureDir) and frame lists
  // (ensure) — skips the filesystem probe on repeat calls
  private val cache = TrieMap[String, (String, Seq[String])]()
  private val dirs = TrieMap[String, String]()
  // one lock PER KEY: two different assets may build concurrently (a
  // JVM-global lock would serialize, e.g., the postings build behind an
  // unrelated index build); two callers of the SAME key in one JVM still
  // get exactly one build. TrieMap.getOrElseUpdate is atomic.
  private val locks = TrieMap[String, Object]()

  private def lockFor(key: String): Object =
    locks.getOrElseUpdate(key, new Object)

  // once-per-JVM staging sweep, run lazily the first time this JVM is
  // about to create a staging dir of its own
  private lazy val gcOnce: Unit = { gcStaging(); () }

  /** Best-effort removal of a partially-written build dir so a failed
    * build never leaves garbage a retry could half-read; uses the active
    * session's Hadoop conf when present (the root may be non-local). */
  private def cleanup(dir: String): Unit =
    try {
      val conf = SparkSession.getActiveSession
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(conf).delete(p, true)
      ()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Resolved persistence root — SPARK_GRAFT_INDEX_DIR or the tmpdir
    * default. ONE resolution shared by every ensure-style cache in the
    * codebase ([[DedupIndex.ensure]], [[VectorIndex]], this object);
    * the historical `graft-dedup-index` default name is kept so
    * existing deployments and the plan guards keep matching. */
  def root: String = {
    val r = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
      s"${sys.props("java.io.tmpdir")}/graft-dedup-index")
    // object-store prefixes need no pre-creation (keys imply prefixes)
    if (!isObjectRoot(r)) Files.createDirectories(Paths.get(r))
    r
  }

  /** Content fingerprint of a source data directory: relative path,
    * length and mtime of every regular file under it. The walk is FULLY
    * RECURSIVE (`Files.walk` with no depth bound), so flat, dir-per-table
    * AND Hive-partitioned layouts (dir/table/part=x/part-*.parquet) are
    * all stamped — a bounded-depth walk would miss the partitioned case
    * and make its regeneration invisible. One full listing per
    * (key, JVM) — resolve results are memoized. Any regeneration
    * touches mtimes, so the stamp changes. Missing/non-directory paths
    * stamp empty — the asset then dedups on the key alone. */
  def sourceStamp(dir: String): String =
    try {
      val p = Paths.get(dir)
      if (!Files.isDirectory(p)) ""
      else {
        val s = Files.walk(p)
        try s.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(f => s"${p.relativize(f)}:${Files.size(f)}:" +
            s"${Files.getLastModifiedTime(f).toMillis}")
          .toSeq.sorted.mkString("|")
        finally s.close()
      }
    } catch { case scala.util.control.NonFatal(_) => "" }

  /** Fingerprint of the CODE that builds assets: a digest of the CLASS
    * BYTES this class was loaded from (jar contents, or every .class
    * under the classes dir). Folded into every asset id so a rebuilt
    * library can never be served an asset persisted by OLDER builder
    * code — the cross-process equivalent of the old per-JVM-rebuild
    * code-freshness guarantee (a logic edit, e.g. a BM25 constant,
    * changes no source data and no key, but it does change the
    * compiled classes). CONTENT-hashed, not mtime-hashed, so
    * byte-identical deployments on different hosts/at different times
    * agree on the token and still share builds. Memoized: one digest
    * pass per JVM. */
  private[operators] lazy val buildToken: String =
    try {
      val md = java.security.MessageDigest.getInstance("SHA-1")
      val loc = getClass.getProtectionDomain.getCodeSource.getLocation
      val p = Paths.get(loc.toURI)
      if (Files.isRegularFile(p)) md.update(Files.readAllBytes(p)) // a jar
      else { // a classes directory: digest every .class, stable order
        val s = Files.walk(p)
        try s.iterator().asScala
          .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".class"))
          .toSeq.sortBy(_.toString)
          .foreach(f => md.update(Files.readAllBytes(f)))
        finally s.close()
      }
      md.digest().map("%02x".format(_)).mkString.take(16)
    } catch {
      case scala.util.control.NonFatal(e) =>
        // e.g. getCodeSource == null under an exotic classloader. The
        // empty token still builds/serves assets correctly, but the
        // code-freshness guarantee is gone — say so LOUDLY, once, and
        // gcStaging additionally skips the superseded-asset sweep (an
        // empty token would classify every healthy asset as foreign).
        System.err.println(
          "[FrameCache] WARNING: builder code fingerprint unavailable " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}); asset ids " +
            "will not change on recompile and the superseded-asset sweep " +
            "is disabled for this process")
        ""
    }

  /** Deterministic asset id: API kind (ensure vs dir — the two APIs
    * publish structurally different assets, so the SAME key string
    * through both must not resolve to one on-disk dir: ensure() would
    * silently return an empty frame map from an ensureDir-published
    * marker instead of building) + key + the source stamp of the key's
    * `<sourceDir>#` prefix (the ensure-key convention) + the builder
    * code fingerprint. */
  private def assetId(kind: String, key: String): String = {
    val src = key.split('#').head
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val bytes = md.digest(
      (kind + "|" + key + " " + sourceStamp(src) + " " + buildToken)
        .getBytes(StandardCharsets.UTF_8))
    bytes.map("%02x".format(_)).mkString.take(16)
  }

  // Build-lease tuning. The heartbeat keeps a LIVE builder's lease mtime
  // fresh however long its build runs; a waiter treats a lease whose
  // mtime is older than `leaseStaleMs` as a crashed builder (heartbeats
  // are 4× more frequent, so only a dead JVM — or one in a >60s GC
  // pause, where a duplicate build is the correct recovery — goes
  // stale). `leaseWaitMs` bounds the total wait so a pathological
  // root/filesystem fails loudly instead of hanging a query forever.
  // The system properties exist so the forked-JVM liveness tests
  // (FrameCacheXprocSpec) can shrink the windows to seconds; production
  // callers never set them.
  private def propMs(name: String, dflt: Long): Long =
    sys.props.get(name).flatMap(v => scala.util.Try(v.toLong).toOption)
      .getOrElse(dflt)
  private val leaseBeatMs = propMs("graft.lease.beatMs", 15000L)
  private val leaseStaleMs = propMs("graft.lease.staleMs", 60000L)
  private val leaseWaitMs = propMs("graft.lease.waitMs", 60L * 60 * 1000)

  /** The cross-process resolve-or-build protocol. Returns the final
    * asset dir and the marker's frame-name lines.
    *
    * BUILD LEASE (round-12): the atomic-rename publish always made the
    * *publish* exactly-once, but N cold-racing JVMs each ran the full
    * build and N−1 threw their work away — at warehouse scale a
    * duplicated postings/index build is the expensive part (the r12
    * 4-stream throughput bench measured per-stream walls 2.6–3.4× solo
    * from exactly this). Builders now take a lease file first
    * (`Files.createFile` — atomic on POSIX; an object store would use a
    * conditional put, same seam as the publish rename): the winner
    * builds under a heartbeat that keeps the lease fresh, losers POLL
    * for the winner's marker instead of building. Crash-safety: a dead
    * builder stops heartbeating, its lease goes stale after
    * [[leaseStaleMs]] and a waiter reclaims it; an un-leasable root
    * (createFile failing for any reason but EEXIST) falls back to the
    * old duplicate-build-then-race behavior, which is correct, just
    * wasteful. */
  private def resolve(kind: String, key: String, build: String => Seq[String])
      : (String, Seq[String]) = {
    val id = assetId(kind, key)
    val rootDir = root
    val store = storeFor(rootDir)
    val objectRoot = isObjectRoot(rootDir)
    val finS = s"$rootDir/asset-$id"
    val fin = if (objectRoot) null else Paths.get(finS)
    val markerPath = s"$finS/$marker"
    val leasePath = s"$rootDir/.lease-$id"
    // raw marker lines; `#`-prefixed lines are protocol metadata
    def readMarker(): Option[Seq[String]] = store.readLinesOpt(markerPath)
    def frameNames(lines: Seq[String]): Seq[String] =
      lines.filter(l => l.nonEmpty && !l.startsWith("#"))
    // pointer-commit assets record the winning attempt dir; rename
    // assets have no pointer and serve the asset dir itself
    def frameDir(lines: Seq[String]): String =
      lines.find(_.startsWith("#dir:"))
        .map(d => s"$finS/${d.stripPrefix("#dir:")}")
        .getOrElse(finS)
    def serve(lines: Seq[String]): (String, Seq[String]) = {
      // READ LEASE: reading doesn't bump mtimes, so a long-lived
      // old-code process could have its asset swept from under it by a
      // newer deployment's superseded-token GC once the tree aged past
      // the bound. Touching the marker on each cross-process resolve
      // (memoized — once per key per JVM) keeps any actively-read
      // asset inside the age bound. Best-effort: a read-only root
      // still resolves. (No-op on object roots — the janitor doesn't
      // run there and a touch would be a rewriting PUT.)
      store.touchQuiet(markerPath)
      (frameDir(lines), frameNames(lines))
    }
    def renamePublish(): (String, Seq[String]) = {
      gcOnce // janitor moment: about to add a staging — sweep dead ones
      val stg = Paths.get(s"$rootDir/.stg-$id-${UUID.randomUUID().toString.take(8)}")
      val names = try {
        Files.createDirectories(stg)
        val ns = build(stg.toString)
        // first marker line records the builder token (the `#` prefix
        // keeps it out of the frame-name list) — the stale-asset
        // sweep keys on it
        Files.write(stg.resolve(marker),
          (s"#token:$buildToken" +: ns).mkString("\n")
            .getBytes(StandardCharsets.UTF_8))
        ns
      } catch { case e: Throwable => cleanup(stg.toString); throw e }
      try {
        Files.move(stg, fin, StandardCopyOption.ATOMIC_MOVE)
        (fin.toString, names)
      } catch {
        // A lost publish race surfaces as EEXIST/ENOTEMPTY from
        // rename-onto-existing — but the JDK maps ENOTEMPTY to a
        // PLAIN FileSystemException on Linux (measured in the xproc
        // race spec), not DirectoryNotEmptyException, so the broad
        // type must be caught. To avoid misclassifying a genuine
        // I/O failure (permissions, full disk) as a race, the
        // decision is made by EVIDENCE, not exception type: if the
        // winner's marker exists (or appears within the bounded
        // poll), it was a race — read the winner; otherwise RETHROW
        // the original exception with its real cause.
        case e: java.nio.file.FileSystemException =>
          cleanup(stg.toString)
          var m = readMarker()
          var tries = 0
          while (m.isEmpty && tries < 50) {
            Thread.sleep(100); m = readMarker(); tries += 1
          }
          m.map(ls => (frameDir(ls), frameNames(ls))).getOrElse(throw e)
      }
    }
    def pointerCommitPublish(): (String, Seq[String]) = {
      // rename-less stores: build under a PRIVATE attempt prefix of the
      // final asset path, then conditionally PUT the marker naming it.
      // The put is the only arbitration; the loser's attempt is
      // unreachable garbage it deletes itself.
      val attempt = s"attempt-${UUID.randomUUID().toString.take(8)}"
      val stg = s"$finS/$attempt"
      val names = try {
        store.mkdirs(stg)
        build(stg)
      } catch { case e: Throwable => cleanup(stg); throw e }
      val content = (s"#token:$buildToken" +: s"#dir:$attempt" +: names)
        .mkString("\n")
      if (store.putExclusive(markerPath, content)) (stg, names)
      else {
        cleanup(stg)
        readMarker().map(ls => (frameDir(ls), frameNames(ls)))
          .getOrElse(throw new IllegalStateException(
            s"lost the marker put for asset $id but the winner's marker " +
              s"is unreadable: $markerPath"))
      }
    }
    def buildAndPublish(): (String, Seq[String]) =
      if (objectRoot) pointerCommitPublish() else renamePublish()
    val deadline = System.currentTimeMillis() + leaseWaitMs
    while (true) {
      readMarker() match {
        case Some(lines) => return serve(lines)
        case None =>
          val acquired =
            try store.putExclusive(leasePath,
              System.currentTimeMillis().toString)
            catch {
              // un-leasable root (read-only probe race, exotic fs):
              // duplicate work beats a deadlock — build anyway and let
              // the publish arbitration decide
              case scala.util.control.NonFatal(_) => true
            }
          if (acquired) {
            // heartbeat daemon: keeps the lease fresh for the whole
            // build so waiters never misread a long LIVE build as a
            // crashed one
            val hb = new Thread(() =>
              try while (!Thread.interrupted()) {
                Thread.sleep(leaseBeatMs)
                // heartbeat swallows I/O failures internally (e.g. the
                // lease was reclaimed or the root went read-only): a
                // missed beat at worst lets a waiter start a duplicate
                // build, which the publish arbitration resolves
                store.heartbeat(leasePath)
              } catch { case _: InterruptedException => () })
            hb.setDaemon(true)
            hb.setName(s"graft-framecache-lease-$id")
            hb.start()
            try return buildAndPublish()
            finally {
              hb.interrupt()
              store.deleteQuiet(leasePath)
            }
          } else {
            // a builder holds the lease: wait for its marker. A lease
            // that stops heartbeating is a crashed builder — reclaim it
            // (delete + retry; the createFile race re-arbitrates if
            // several waiters reclaim at once).
            Thread.sleep(200)
            if (System.currentTimeMillis() > deadline)
              throw new IllegalStateException(
                s"timed out after ${leaseWaitMs / 1000}s waiting for the " +
                  s"builder of asset $id (key '$key'); lease: $leasePath")
            val stale =
              try System.currentTimeMillis() -
                store.lastModMs(leasePath) > leaseStaleMs
              catch {
                // lease vanished: builder finished (marker next loop) or
                // failed (we contend for the lease next loop)
                case scala.util.control.NonFatal(_) => false
              }
            if (stale) {
              System.err.println(
                s"[FrameCache] reclaiming stale build lease for asset $id " +
                  "(builder stopped heartbeating)")
              store.deleteQuiet(leasePath)
            }
          }
      }
    }
    sys.error("unreachable") // while(true) always returns/throws
  }

  /** Garbage-collect the warehouse root:
    *
    *  - ABANDONED STAGINGS (`.stg-*`): a builder that crashed between
    *    createDirectories and its publish rename leaves its private
    *    staging behind — nothing else ever removes it. Only stagings
    *    whose whole TREE is untouched for `maxAgeMillis` go (a live
    *    builder streams into nested frame dirs, so aging by the newest
    *    mtime anywhere under the tree keeps an in-flight build fresh).
    *  - SUPERSEDED ASSETS (`asset-*` whose marker records a DIFFERENT
    *    builder token than this JVM's): a recompile re-ids every
    *    asset, and without this sweep the orphans of each code version
    *    accumulate until the root fills the disk. The same tree-age
    *    bound applies, so an old-code process that is STILL actively
    *    reading (reads don't touch mtimes, but 6h-old deployments
    *    still running old code are the documented trade) is the only
    *    exposure; current-token assets are never touched.
    *
    * Returns the number of directories removed. Safe to call from any
    * process at any time; `rootDir` is overridable so tests sweep an
    * isolated root instead of the live shared one. */
  def gcStaging(maxAgeMillis: Long = 6L * 3600 * 1000,
      rootDir: String = root): Int = {
    // object roots: orphaned attempt prefixes are unreachable (readers
    // follow marker pointers, never list) — cleanup belongs to the
    // store's lifecycle rules, not a walking janitor doing LIST storms
    if (isObjectRoot(rootDir)) return 0
    val cutoff = System.currentTimeMillis() - maxAgeMillis
    def newestUnder(p: Path): Long =
      try {
        val w = Files.walk(p)
        try w.iterator().asScala
          .map(f => Files.getLastModifiedTime(f).toMillis)
          .foldLeft(0L)(math.max)
        finally w.close()
      } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    def markerToken(p: Path): Option[String] =
      try {
        val m = p.resolve(marker)
        if (!Files.exists(m)) None
        else Files.readAllLines(m, StandardCharsets.UTF_8).asScala
          .find(_.startsWith("#token:")).map(_.stripPrefix("#token:"))
      } catch { case scala.util.control.NonFatal(_) => None }
    val s = Files.list(Paths.get(rootDir))
    try {
      val stale = s.iterator().asScala.filter { p =>
        val name = p.getFileName.toString
        val dead =
          if (name.startsWith(".stg-")) true
          // a crashed builder's lease is reclaimed on contact by any
          // waiter (staleness check in resolve); the sweep is for leases
          // nobody ever contends for again
          else if (name.startsWith(".lease-")) true
          else if (name.startsWith("asset-"))
            // unreadable/absent marker ⇒ not this protocol's asset:
            // leave it alone. Foreign tokens are superseded code —
            // UNLESS this process's own token degraded to empty
            // (fingerprint unavailable), in which case every healthy
            // asset would read as foreign: skip the sweep entirely and
            // keep only the dead-staging sweep.
            buildToken.nonEmpty && markerToken(p).exists(_ != buildToken)
          else false
        dead && newestUnder(p) < cutoff
      }.toList
      stale.foreach(p => cleanup(p.toString))
      stale.size
    } finally s.close()
  }

  /** Build-once DIRECTORY for `key`: the first caller — across ALL
    * processes sharing [[root]] — runs `build` against a staging dir;
    * every caller gets the published path. The primitive under
    * [[ensure]] and the index caches — callers own the layout inside
    * the dir (the marker file name `_GRAFT_COMPLETE` is reserved). */
  def ensureDir(key: String)(build: String => Unit): String =
    lockFor(s"dir#$key").synchronized {
      dirs.get(key) match {
        case Some(d) => d
        case None =>
          val (d, _) = resolve("dir", key, { stg => build(stg); Seq.empty })
          dirs.put(key, d)
          d
      }
    }

  /** Ensure `key`'s frames exist on disk; return them as parquet
    * read-backs keyed by the names `build` gave them. A build that
    * throws caches NOTHING and deletes its staging — the next caller
    * retries from scratch. Cross-process readers recover the frame
    * names from the completion marker. */
  def ensure(spark: SparkSession, key: String)
      (build: => Seq[(String, DataFrame)]): Map[String, DataFrame] = {
    val (dir, names) = lockFor(s"ensure#$key").synchronized {
      cache.get(key) match {
        case Some(v) => v
        case None =>
          val v = resolve("ensure", key, { stg =>
            val frames = build
            frames.foreach { case (n, df) =>
              df.write.mode("overwrite").parquet(s"$stg/$n")
            }
            frames.map(_._1)
          })
          cache.put(key, v)
          v
      }
    }
    names.map(n => n -> spark.read.parquet(s"$dir/$n")).toMap
  }
}
