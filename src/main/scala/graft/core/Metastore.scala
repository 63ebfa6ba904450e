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

  /** Pure diff of two table-version states
   * (reference `Metastore.scala:56-84`). Changing a table from snapshot to
   * partitioned (or vice versa) is illegal. */
  def computeChanges(oldVersion: TableVersion, newVersion: TableVersion): TableChanges = {
    import TableOperation._
    (oldVersion, newVersion) match {
      case (SnapshotTableVersion(oldV), SnapshotTableVersion(newV)) =>
        if (oldV != newV) TableChanges(List(UpdateTableVersion(newV)))
        else TableChanges(Nil)

      case (PartitionedTableVersion(oldPVs), PartitionedTableVersion(newPVs)) =>
        val oldPartitions = oldPVs.keys.toList
        val newPartitions = newPVs.keys.toList

        val added   = newPartitions diff oldPartitions
        val removed = oldPartitions diff newPartitions
        val updated = (oldPartitions intersect newPartitions).filter(p => oldPVs(p) != newPVs(p))

        TableChanges(
          added.map(p => AddPartition(p, newPVs(p))) ++
            removed.map(RemovePartition) ++
            updated.map(p => UpdatePartitionVersion(p, newPVs(p))))

      case _ =>
        throw new IllegalArgumentException("Can't change table from snapshot table to partitioned")
    }
  }
}
