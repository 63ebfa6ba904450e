package graft.cli

import graft.core._
import graft.core.TableVersions.CommitId

/**
 * Thin command-line front end over the versioning API (V24 — a stub in the
 * reference, `cli/src/main/scala/com/gu/tableversions/cli/TableVersions.scala:7-12`,
 * here made functional over the durable JSON commit log).
 *
 * Usage:
 *   TableVersionsCli <logDir> history  <schema.table>
 *   TableVersionsCli <logDir> current  <schema.table>
 *   TableVersionsCli <logDir> checkout <schema.table> <commitId>
 *   TableVersionsCli <logDir> diff     <schema.table> <fromCommit> <toCommit>
 */
object TableVersionsCli {

  def main(args: Array[String]): Unit = run(args, Console.out.println(_))

  private[graft] def run(args: Array[String], out: String => Unit): Unit = args.toList match {
    case logDir :: "history" :: name :: Nil =>
      withTable(logDir, name) { (log, table) =>
        log.updates(table).foreach { u =>
          out(s"${u.id.id}  ${u.timestamp}  ${u.userId.value}  ${u.message.content}")
        }
      }
    case logDir :: "current" :: name :: Nil =>
      withTable(logDir, name) { (log, table) =>
        log.currentVersion(table) match {
          case SnapshotTableVersion(v) => out(s"snapshot version: ${v.label}")
          case PartitionedTableVersion(pvs) =>
            pvs.toSeq.sortBy(_._1.hivePath).foreach { case (p, v) =>
              out(s"${p.hivePath} -> ${v.label}")
            }
        }
      }
    case logDir :: "checkout" :: name :: commit :: Nil =>
      withTable(logDir, name) { (log, table) =>
        log.setCurrentVersion(table, CommitId(commit))
        out(s"checked out $commit")
      }
    case logDir :: "diff" :: name :: from :: to :: Nil =>
      // metadata twin of VersionedReader.readChanges: which partitions an
      // incremental job would have to process between the two commits
      withTable(logDir, name) { (log, table) =>
        (log.versionAt(table, CommitId(from)), log.versionAt(table, CommitId(to))) match {
          case (SnapshotTableVersion(a), SnapshotTableVersion(b)) =>
            out(if (a == b) "unchanged" else s"snapshot: ${a.label} -> ${b.label}")
          case (PartitionedTableVersion(pa), PartitionedTableVersion(pb)) =>
            val changed = pb.toSeq
              .filter { case (p, v) => !pa.get(p).contains(v) }
              .sortBy(_._1.hivePath)
            val removed = (pa.keySet -- pb.keySet).toSeq.sortBy(_.hivePath)
            if (changed.isEmpty && removed.isEmpty) out("unchanged")
            changed.foreach { case (p, v) =>
              val kind = if (pa.contains(p)) "replaced" else "added"
              out(s"${p.hivePath} -> ${v.label} ($kind)")
            }
            removed.foreach(p => out(s"${p.hivePath} (removed)"))
          case _ => out("table changed partitioning shape between commits")
        }
      }
    case _ =>
      out("usage: TableVersionsCli <logDir> (history|current) <schema.table> | " +
        "<logDir> checkout <schema.table> <commitId> | " +
        "<logDir> diff <schema.table> <fromCommit> <toCommit>")
  }

  private def withTable(logDir: String, name: String)(
      f: (TableVersions, TableName) => Unit): Unit =
    TableName.fromFullyQualified(name) match {
      case Right(table) => f(JsonFileTableVersions(logDir), table)
      case Left(err)    => throw new IllegalArgumentException(err)
    }
}
