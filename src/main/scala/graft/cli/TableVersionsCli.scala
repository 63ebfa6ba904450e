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
    case _ =>
      out("usage: TableVersionsCli <logDir> (history|current) <schema.table> | <logDir> checkout <schema.table> <commitId>")
  }

  private def withTable(logDir: String, name: String)(
      f: (TableVersions, TableName) => Unit): Unit =
    TableName.fromFullyQualified(name) match {
      case Right(table) => f(JsonFileTableVersions(logDir), table)
      case Left(err)    => throw new IllegalArgumentException(err)
    }
}
