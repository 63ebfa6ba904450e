package graft.core

import java.util.concurrent.atomic.AtomicReference
import scala.annotation.tailrec

import Metastore.{TableChanges, TableOperation}

/**
 * Catalog-free `Metastore`: holds each table's current `TableVersion`
 * directly instead of encoding it in Hive/Glue partition locations.
 *
 * Concrete counterpart to the reference's `SparkHiveMetastore`
 * (`spark/src/main/scala/com/gu/tableversions/spark/SparkHiveMetastore.scala:16-159`)
 * with the catalog replaced by an in-process map — per SURVEY.md §7.2 step 5
 * the read path resolves versions from the commit log, so a Hive/Derby
 * catalog is unnecessary. DDL-op semantics match Hive's `IF [NOT] EXISTS`
 * behavior: re-adding an existing partition and removing a missing one are
 * no-ops, but updating a missing partition is an error that leaves the
 * table state untouched.
 */
final class InMemoryMetastore extends Metastore {

  private val tables = new AtomicReference[Map[TableName, TableVersion]](Map.empty)

  /** Register a table (the analogue of `CREATE EXTERNAL TABLE`). Idempotent. */
  override def register(table: TableDefinition): Unit =
    mutate { state =>
      if (state.contains(table.name)) Right(state)
      else {
        val empty: TableVersion =
          if (table.isSnapshot) SnapshotTableVersion(Version.Unversioned)
          else PartitionedTableVersion(Map.empty)
        Right(state.updated(table.name, empty))
      }
    }

  override def currentVersion(table: TableName): TableVersion =
    tables.get().getOrElse(table, throw InMemoryMetastore.unregistered(table))

  override def update(table: TableName, changes: TableChanges): Unit =
    mutate { state =>
      state.get(table) match {
        case None => Left(InMemoryMetastore.unregistered(table))
        case Some(current) =>
          changes.operations
            .foldLeft(Right(current): Either[Exception, TableVersion])(
              (acc, op) => acc.flatMap(applyOp(table, _, op)))
            .map(next => state.updated(table, next))
      }
    }

  private def applyOp(
      table: TableName,
      state: TableVersion,
      op: TableOperation): Either[Exception, TableVersion] = {
    import TableOperation._
    (state, op) match {
      case (SnapshotTableVersion(_), UpdateTableVersion(v)) =>
        Right(SnapshotTableVersion(v))
      case (PartitionedTableVersion(pvs), AddPartition(p, v)) =>
        // ADD IF NOT EXISTS: first writer wins, re-add is a no-op
        Right(PartitionedTableVersion(if (pvs.contains(p)) pvs else pvs.updated(p, v)))
      case (PartitionedTableVersion(pvs), UpdatePartitionVersion(p, v)) =>
        if (pvs.contains(p)) Right(PartitionedTableVersion(pvs.updated(p, v)))
        else Left(new NoSuchElementException(
          s"cannot update partition $p of ${table.fullyQualifiedName}: not present in catalog"))
      case (PartitionedTableVersion(pvs), RemovePartition(p)) =>
        // DROP IF EXISTS semantics
        Right(PartitionedTableVersion(pvs.removed(p)))
      case (_, other) =>
        Left(new IllegalArgumentException(
          s"operation $other does not apply to the ${state.getClass.getSimpleName} table ${table.fullyQualifiedName}"))
    }
  }

  @tailrec
  private def mutate(
      f: Map[TableName, TableVersion] => Either[Exception, Map[TableName, TableVersion]]): Unit = {
    val before = tables.get()
    f(before) match {
      case Left(e) => throw e
      case Right(after) =>
        if (!tables.compareAndSet(before, after)) mutate(f)
    }
  }
}

object InMemoryMetastore {
  def unregistered(table: TableName): Exception =
    new NoSuchElementException(s"table ${table.fullyQualifiedName} is not registered in the metastore")
}
