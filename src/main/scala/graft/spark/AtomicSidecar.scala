package graft.spark

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFileSystem, FileContext, Options, Path}

/** Crash-safe persistence for single-file JSON metadata sidecars
  * (column mapping, constraints, generated columns, identity
  * declarations, partition-scheme eras, MV definitions).
  *
  * The naive `fs.create(path, overwrite = true)` truncates in place: a
  * crash between truncate and close leaves torn JSON, and every later
  * read of the table's metadata throws until someone hand-repairs the
  * file. This helper applies the same discipline the commit log
  * (JsonFileTableVersions, ATOMIC_MOVE) and DV sidecars (staged dir +
  * rename) already use: write a hidden temp file in the target's
  * directory, then atomically move it over the destination, so a reader
  * always observes either the previous state or the new one — never a
  * partial file and never a missing one.
  *
  *  - `file:` paths move via `rename(2)` (java.nio ATOMIC_MOVE), a true
  *    atomic replace.
  *  - other schemes go through `FileContext.rename(..., OVERWRITE)`,
  *    which HDFS implements atomically.
  *
  * Checksum caveat: Hadoop's default local FS is checksummed. Renaming
  * only the data file under it would strand a stale `.crc` that makes
  * every subsequent read fail verification — the exact bricking this
  * helper exists to prevent. So the temp file is written through the
  * RAW filesystem and any checksum sidecar left by an earlier
  * overwrite-in-place writer is dropped before the move.
  */
object AtomicSidecar {

  def writeUtf8(conf: Configuration, path: Path, content: String): Unit =
    writeUtf8(conf, path, content, () => ())

  /** Test seam: `beforePublish` runs after the temp file is durable but
    * before the atomic move — throwing from it is exactly a crash at the
    * worst moment, leaving the previous state intact on disk. */
  private[spark] def writeUtf8(
      conf: Configuration,
      path: Path,
      content: String,
      beforePublish: () => Unit): Unit = {
    val outer = path.getFileSystem(conf)
    val fs = outer match {
      case c: ChecksumFileSystem => c.getRawFileSystem
      case other                 => other
    }
    val target = fs.makeQualified(path)
    val tmp = new Path(
      target.getParent, s".${target.getName}.tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    outer match {
      case c: ChecksumFileSystem =>
        // stale checksum from a pre-atomic writer; absence = no verify
        fs.delete(c.getChecksumFile(target), false)
      case _ => ()
    }
    beforePublish()
    val uri = target.toUri
    if (uri.getScheme == null || uri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      FileContext.getFileContext(uri, conf)
        .rename(tmp, target, Options.Rename.OVERWRITE)
    }
  }
}
