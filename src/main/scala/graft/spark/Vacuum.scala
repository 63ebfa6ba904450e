package graft.spark

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.core._

/**
 * Offline storage GC. The versioned layout never deletes data on write
 * (reference `VersionPaths.scala:15-22` — no delete code anywhere, flagged
 * in SURVEY.md §6 as unbounded storage overhead); `vacuum` reclaims space
 * by deleting version directories that no retained commit references.
 *
 * Retention: the states produced by the current pointer and by each of the
 * most recent `keepLast` commits are kept (so `checkout` to any of them
 * still works); everything older is deleted. Runs driver-side with
 * O(#versions) metadata ops — no Spark job needed.
 *
 * Concurrent-writer safety: a `versionedInsertInto` in flight has written
 * (or is renaming) its version directories BEFORE its commit lands in the
 * log, so those dirs look unreferenced. Version dirs modified within
 * `graceMs` (Delta-style retention grace, default 10 min) are therefore
 * never deleted — only pass `graceMs = 0` when no writer can be running.
 */
object Vacuum {

  /** Default deletion grace for young version dirs (ms). */
  val DefaultGraceMs: Long = 10 * 60 * 1000L

  final case class Report(examined: Int, deleted: List[String])

  def vacuum(
      table: TableDefinition,
      log: TableVersions,
      hadoopConf: Configuration,
      keepLast: Int = 3,
      graceMs: Long = DefaultGraceMs): Report = {

    val commits = log.updates(table.name).take(math.max(keepLast, 1))
    val states = log.currentVersion(table.name) ::
      commits.map(c => log.versionAt(table.name, c.id))

    // every (relative dir, label) any retained state references — in the
    // ESCAPED on-disk form, which is what the directory listing yields
    // (raw hivePath here would doom live dirs of partitions whose values
    // need Hive escaping)
    val referenced: Set[String] = states.flatMap {
      case SnapshotTableVersion(v) => List(v.label)
      case PartitionedTableVersion(pvs) =>
        pvs.map { case (p, v) => s"${SparkPaths.escapedPartitionPath(p)}/${v.label}" }
    }.toSet

    val fs = FileSystem.get(table.location, hadoopConf)
    val root = new HPath(table.location.toString.stripSuffix("/"))

    val cutoff = System.currentTimeMillis() - math.max(graceMs, 0L)

    // (relative dir, old enough to delete)
    def versionDirsUnder(dir: HPath, prefix: String): List[(String, Boolean)] =
      if (!fs.exists(dir)) Nil
      else
        fs.listStatus(dir).toList.filter(_.isDirectory).flatMap { st =>
          val name = st.getPath.getName
          val rel = if (prefix.isEmpty) name else s"$prefix/$name"
          if (Version.parse(name).isRight) List(rel -> (st.getModificationTime < cutoff))
          else if (name.contains("=")) versionDirsUnder(st.getPath, rel)
          else Nil // _staging remnants etc. are not version dirs
        }

    val onDisk = versionDirsUnder(root, "")
    val doomed = onDisk.collect {
      case (rel, oldEnough) if oldEnough && !referenced.contains(rel) => rel
    }
    doomed.foreach(rel => fs.delete(new HPath(root, rel), true))
    Report(examined = onDisk.size, deleted = doomed.sorted)
  }
}
