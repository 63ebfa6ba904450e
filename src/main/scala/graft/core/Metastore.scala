package graft.core

import Metastore.TableChanges

/**
 * API for manipulating and querying a metastore (catalog) holding versioned
 * tables. Supports both snapshot and partitioned tables.
 *
 * Mirrors the reference `core/src/main/scala/com/gu/tableversions/core/Metastore.scala:11-86`
 * (synchronous instead of `F[_]`).
 */
trait Metastore {

  /** Register a table with the catalog (`CREATE EXTERNAL TABLE` analogue).
   * No-op by default: catalog-backed metastores resolve tables created by
   * caller-side DDL; in-process metastores override to seed their state.
   * On the trait — not an instanceof special case at call sites — so any
   * implementation needing registration participates in `init`. */
  def register(table: TableDefinition): Unit = ()

  /** Current catalog state of the table interpreted as version information.
   * Versions are parsed back out of location URIs (the "locations are the
   * database" design — reference `SparkHiveMetastore.scala:21-43`). */
  def currentVersion(table: TableName): TableVersion

  /** Apply the given changes to the table in the catalog, sequentially. */
  def update(table: TableName, changes: TableChanges): Unit

  /** Changes needed to convert the `current` catalog state to `target`. */
  def computeChanges(current: TableVersion, target: TableVersion): TableChanges =
    Metastore.computeChanges(current, target)
}

object Metastore {

  final case class TableChanges(operations: List[TableOperation])

  object TableChanges {
    def apply(operations: TableOperation*): TableChanges = TableChanges(operations.toList)
  }

  /** ADT of catalog-level diff operations (reference `Metastore.scala:47-54`). */
  sealed trait TableOperation

  object TableOperation {
    final case class AddPartition(partition: Partition, version: Version) extends TableOperation
    final case class UpdatePartitionVersion(partition: Partition, version: Version) extends TableOperation
    final case class RemovePartition(partition: Partition) extends TableOperation
    final case class UpdateTableVersion(versionNumber: Version) extends TableOperation
  }

  /** Pure diff: the catalog operations that take state `from` to state `to`
   * (semantics as reference `Metastore.scala:56-84`). A table can never
   * switch between snapshot and partitioned layouts. */
  def computeChanges(from: TableVersion, to: TableVersion): TableChanges = {
    import TableOperation._
    (from, to) match {
      case (SnapshotTableVersion(before), SnapshotTableVersion(after)) =>
        TableChanges(if (before == after) Nil else List(UpdateTableVersion(after)))

      case (PartitionedTableVersion(before), PartitionedTableVersion(after)) =>
        // one pass over the key union, classifying each partition
        val everyPartition = (before.keySet ++ after.keySet).toList
        val ops = everyPartition.flatMap { p =>
          (before.get(p), after.get(p)) match {
            case (None, Some(v))                    => Some(AddPartition(p, v))
            case (Some(_), None)                    => Some(RemovePartition(p))
            case (Some(a), Some(b)) if a != b       => Some(UpdatePartitionVersion(p, b))
            case _                                  => None
          }
        }
        // deterministic grouping: adds, then removes, then updates
        TableChanges(
          ops.collect { case op: AddPartition => op } ++
            ops.collect { case op: RemovePartition => op } ++
            ops.collect { case op: UpdatePartitionVersion => op })

      case _ =>
        throw new IllegalArgumentException(
          "a table's layout is fixed at init: snapshot and partitioned states cannot be diffed")
    }
  }
}
