package graft.core

import java.time.Instant
import java.util.UUID

/**
 * Commit-log interface: querying and updating the version history of tables.
 *
 * Semantics mirror the reference implementation
 * (guardian/table-versions, `core/src/main/scala/com/gu/tableversions/core/TableVersions.scala:14-164`):
 *  - `init` is idempotent (re-init of a tracked table is a no-op);
 *  - `commit` appends an update and always moves the current pointer to it;
 *  - `currentVersion` folds the history *up to and including* the update the
 *    current pointer names — so after a rollback the fold sees only a prefix,
 *    but a later commit appends at the end AND moves the pointer there,
 *    resurrecting every intermediate update (the fold passes through them).
 *    This rollback-then-commit quirk is deliberate and test-pinned.
 *
 * Differences: plain synchronous Scala instead of `F[_]`/cats-effect
 * (errors are thrown), `List` + require instead of `NonEmptyList`.
 */
trait TableVersions {
  import TableVersions._

  /** Start tracking version information for the given table.
   * Must be called before any other operation on the table. Idempotent. */
  def init(
      table: TableName,
      isSnapshot: Boolean,
      userId: UserId,
      message: UpdateMessage,
      timestamp: Instant): Unit =
    handleInit(table) {
      val initialUpdate =
        TableUpdate(userId, message, timestamp, operations = List(TableOperation.InitTable(table, isSnapshot)))
      TableState(currentVersion = initialUpdate.metadata.id, updates = List(initialUpdate))
    }

  /** Current version state of the table, derived by folding the history up to
   * the current-version pointer (reference `TableVersions.scala:29-41`). */
  def currentVersion(table: TableName): TableVersion =
    currentVersionFromState(tableState(table))

  /** History of updates, most recent first (reference `TableVersions.scala:44-45`). */
  def updates(table: TableName): List[TableUpdateMetadata] =
    tableState(table).updates.map(_.metadata).reverse

  /** Version state as of a specific commit, regardless of the current pointer
   * (time-travel reads, Q26). Pure fold over the history prefix. */
  def versionAt(table: TableName, id: CommitId): TableVersion = {
    val state = tableState(table)
    if (!state.updates.exists(_.metadata.id == id)) throw unknownCommitId(id)
    currentVersionFromState(state.copy(currentVersion = id))
  }

  /** Append an update atomically; the new commit becomes current. */
  def commit(table: TableName, update: TableUpdate): Unit

  /** Move the current pointer to an existing commit (rollback). Errors on an
   * unknown table or commit id. */
  def setCurrentVersion(table: TableName, id: CommitId): Unit

  // Internal operations provided by implementations

  /** Full persisted state of the table; throws `unknownTableError` if untracked. */
  protected def tableState(table: TableName): TableState

  /** Initialise a new table unless it already exists (idempotent). */
  protected def handleInit(table: TableName)(newTableState: => TableState): Unit
}

object TableVersions {

  final case class CommitId(id: String)
  final case class UserId(value: String)
  final case class UpdateMessage(content: String)

  final case class TableUpdateMetadata(
      id: CommitId,
      userId: UserId,
      message: UpdateMessage,
      timestamp: Instant
  )

  object TableUpdateMetadata {
    def apply(userId: UserId, message: UpdateMessage, timestamp: Instant): TableUpdateMetadata =
      TableUpdateMetadata(CommitId(UUID.randomUUID().toString), userId, message, timestamp)
  }

  /** A set of operations applied and tracked as one atomic commit. */
  final case class TableUpdate(metadata: TableUpdateMetadata, operations: List[TableOperation])

  object TableUpdate {
    def apply(
        userId: UserId,
        message: UpdateMessage,
        timestamp: Instant,
        operations: List[TableOperation]): TableUpdate =
      TableUpdate(TableUpdateMetadata(userId, message, timestamp), operations)
  }

  /** ADT of operations recorded in the history
   * (reference `TableVersions.scala:112-119`). */
  sealed trait TableOperation

  object TableOperation {
    final case class InitTable(tableName: TableName, isSnapshot: Boolean) extends TableOperation
    final case class AddTableVersion(version: Version) extends TableOperation
    final case class AddPartitionVersion(partition: Partition, version: Version) extends TableOperation
    final case class RemovePartition(partition: Partition) extends TableOperation
  }

  /**
   * Persisted state of a table: the full ordered update history plus the
   * current-version pointer (≠ head only after a rollback).
   */
  final case class TableState(currentVersion: CommitId, updates: List[TableUpdate])

  /** The shared fold: history + pointer → TableVersion
   * (reference `TableVersions.scala:32-41`). */
  def currentVersionFromState(state: TableState): TableVersion = {
    val (before, after) = state.updates.span(_.metadata.id != state.currentVersion)
    val updatesForCurrentVersion = before ++ after.take(1)
    val operations = updatesForCurrentVersion.flatMap(_.operations)
    if (isSnapshotTable(operations)) latestSnapshotTableVersion(operations)
    else applyPartitionUpdates(PartitionedTableVersion(Map.empty))(operations)
  }

  /** Last-writer-wins fold of partition operations
   * (reference `TableVersions.scala:135-149`). */
  def applyPartitionUpdates(initial: PartitionedTableVersion)(
      operations: List[TableOperation]): PartitionedTableVersion = {
    import TableOperation._
    val latest = operations.foldLeft(initial.partitionVersions) {
      case (agg, AddPartitionVersion(partition, version)) => agg + (partition -> version)
      case (agg, RemovePartition(partition))              => agg - partition
      case (agg, _: InitTable | _: AddTableVersion)       => agg
    }
    PartitionedTableVersion(latest)
  }

  /** Latest snapshot version in the history (reference `TableVersions.scala:154-159`). */
  def latestSnapshotTableVersion(operations: List[TableOperation]): SnapshotTableVersion = {
    val versions = operations.collect { case TableOperation.AddTableVersion(v) => v }
    SnapshotTableVersion(versions.lastOption.getOrElse(Version.Unversioned))
  }

  /** The first operation must be the table's init; it fixes the table kind
   * (reference `TableVersions.scala:161-164`). */
  def isSnapshotTable(operations: List[TableOperation]): Boolean = operations match {
    case TableOperation.InitTable(_, isSnapshot) :: _ => isSnapshot
    case _ =>
      throw new IllegalArgumentException("First operation should be initialising the table")
  }

  def unknownTableError(table: TableName): Exception =
    new Exception(s"Unknown table '${table.fullyQualifiedName}'")

  def unknownCommitId(id: CommitId): Exception =
    new Exception(s"Unknown commit ID '$id'")
}
