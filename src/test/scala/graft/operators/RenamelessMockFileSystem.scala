package graft.operators

import java.io.FileNotFoundException
import java.nio.file.{Files, StandardCopyOption}

import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** `rlmock:` — an object-store stand-in with S3's two defining write
  * semantics, registered like any connector (`fs.rlmock.impl`):
  *
  *  - RENAME IS NOT ATOMIC: implemented as copy + delete-source (what
  *    S3A actually does), so any protocol using rename as its
  *    arbitration point is broken on this scheme by construction.
  *  - PUT IS ATOMIC AND CONDITIONAL: `create(path, overwrite = false)`
  *    buffers the object and commits it ALL-OR-NOTHING at close via an
  *    exclusive hard link — the `If-None-Match` PUT. A losing racer gets
  *    `FileAlreadyExistsException` at close and the store never exposes
  *    a torn or duplicate object.
  *
  * Locally backed, so specs can inspect the bucket's state through the
  * ordinary filesystem path. */
class RenamelessMockFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "rlmock"
  override def getUri: java.net.URI = java.net.URI.create("rlmock:///")

  override def rename(src: HPath, dst: HPath): Boolean = {
    // S3A shape: copy object-by-object, then delete the source — never
    // atomic, and a crash mid-way leaves both trees half-populated
    val srcFile = pathToFile(src)
    if (!srcFile.exists()) return false
    org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst, true, getConf)
  }

  override def create(f: HPath, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val target = pathToFile(f).toPath
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, ".put-", ".tmp")
    val out = Files.newOutputStream(tmp)
    val committing = new java.io.OutputStream {
      override def write(b: Int): Unit = out.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = {
        out.close()
        try {
          if (overwrite)
            Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
          else {
            // exclusive atomic commit: link(2) fails with EEXIST if the
            // object landed first — the conditional-put loser's signal
            try Files.createLink(target, tmp)
            catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                throw new org.apache.hadoop.fs.FileAlreadyExistsException(
                  s"conditional put lost: $target already exists")
            }
          }
        } finally { Files.deleteIfExists(tmp); () }
      }
    }
    new FSDataOutputStream(committing, statistics)
  }

  override def open(f: HPath, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    if (!pathToFile(f).exists()) throw new FileNotFoundException(f.toString)
    super.open(f, bufferSize)
  }
}
