package graft.spark

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFileSystem, Path}

/** Mutual exclusion for shared-file metadata rewrites — the
  * create-exclusive lock discipline of the commit log
  * (`JsonFileTableVersions.withTableLock`) lifted to a Hadoop path, so
  * files that live at the TABLE location (the partition-scheme registry,
  * shared by every clone of a location) can serialize their
  * read-transform-rename cycles.
  *
  * Why verify-retry alone is not enough (the round-16 `weak`): a rewrite
  * that re-reads, renames, then verifies its own edit survived catches a
  * clobber landing BEFORE its verify — but not one landing AFTER. Writer
  * B re-reads, writer A completes a full write+verify inside B's
  * re-read→rename gap, B's rename clobbers A's entry, and B's verify
  * passes because B only checks its own edit. A lock makes the whole
  * cycle a critical section; verify-retry stays as the belt-and-suspenders
  * check (it also covers writers that predate the lock discipline).
  *
  * Keying: the lock file sits NEXT TO the guarded file
  * (`.<name>.lock`), so writers keyed by different table NAMES sharing
  * one location (shallow clones) contend on the same lock — the registry
  * is per-location state.
  *
  * Semantics requirement (the commit log's posture, verbatim): atomic
  * CREATE_NEW, atomic rename, read-after-write visibility — POSIX/HDFS,
  * not bare S3. `file:` paths run on java.nio (true atomic CREATE_NEW /
  * ATOMIC_MOVE); other schemes use `FileSystem.create(overwrite=false)`
  * and `rename`, which HDFS implements atomically.
  *
  * Liveness: critical sections are small-file reads and one atomic
  * rename — milliseconds. A lock older than `LockTimeoutMs` is a crashed
  * holder's; breaking it is race-free (token re-read after a grace beat,
  * then an atomic move of the corpse that exactly one waiter wins, then
  * a post-move token check that restores a lock re-acquired in the
  * window). Release deletes the lock only while it still carries our
  * token. Not re-entrant. */
object MetadataLock {

  private[spark] val LockTimeoutMs = 30000L
  private val LockRetryMs = 25L
  private val LockBreakRecheckMs = 50L

  def withLock[A](conf: Configuration, guarded: Path)(body: => A): A = {
    val outer = guarded.getFileSystem(conf)
    val fs = outer match {
      case c: ChecksumFileSystem => c.getRawFileSystem
      case other                 => other
    }
    val target = fs.makeQualified(guarded)
    val lock = new Path(target.getParent, s".${target.getName}.lock")
    val token = java.util.UUID.randomUUID().toString
    val uri = target.toUri
    val local = uri.getScheme == null || uri.getScheme == "file"

    def nio(p: Path): java.nio.file.Path = java.nio.file.Paths.get(p.toUri.getPath)

    def tryAcquire(): Boolean =
      if (local) {
        try {
          java.nio.file.Files.createDirectories(nio(lock).getParent)
          java.nio.file.Files.write(nio(lock), token.getBytes(StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException                      => false
        }
      } else {
        try {
          val out = fs.create(lock, false)
          try out.write(token.getBytes(StandardCharsets.UTF_8))
          finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      }

    def tokenOf(p: Path): Option[String] =
      try {
        val in = fs.open(p)
        try Some(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8))
        finally in.close()
      } catch { case _: java.io.IOException => None }

    def ageMs(): Option[Long] =
      try Some(System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime)
      catch { case _: java.io.IOException => None }

    var acquired = false
    while (!acquired) {
      if (tryAcquire()) acquired = true
      else {
        val stale = ageMs().exists(_ > LockTimeoutMs)
        if (stale) {
          // confirm the SAME holder is still stuck: token, grace beat,
          // re-read — a lock released and re-acquired in between carries
          // a fresh token and is never broken
          val before = tokenOf(lock)
          Thread.sleep(LockBreakRecheckMs)
          val after = tokenOf(lock)
          if (before.isDefined && before == after) {
            val corpse = new Path(
              lock.getParent, s"${lock.getName}.broken.${java.util.UUID.randomUUID()}")
            try {
              val moved =
                if (local)
                  try {
                    java.nio.file.Files.move(nio(lock), nio(corpse),
                      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
                    true
                  } catch { case _: java.io.IOException => false }
                else fs.rename(lock, corpse)
              if (moved) {
                // post-move token check: a holder that released and a NEW
                // writer that acquired between the re-read and the move
                // leave the new writer's token in the corpse — restore it
                // (plain move, refuses an existing target) rather than
                // admitting a second writer
                val movedToken = tokenOf(corpse)
                if (movedToken == after) { fs.delete(corpse, false); () }
                else if (local) {
                  try { java.nio.file.Files.move(nio(corpse), nio(lock)); () }
                  catch { case _: java.io.IOException => () }
                } else { fs.rename(corpse, lock); () }
              }
            } catch { case _: java.io.IOException => () }
          } else Thread.sleep(LockRetryMs)
        } else Thread.sleep(LockRetryMs)
      }
    }
    try body
    finally {
      // release only while the lock still carries our token — a breaker
      // may have replaced it with its own
      try if (tokenOf(lock).contains(token)) { fs.delete(lock, false); () }
      catch { case _: java.io.IOException => () }
    }
  }
}
