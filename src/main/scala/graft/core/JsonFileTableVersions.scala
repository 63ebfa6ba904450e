package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Instant

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import TableVersions._

/**
 * Durable commit log: one JSON-lines file per table under `logDir`, e.g.
 * `<warehouse>/_versions/schema.name.jsonl`. Each line is a self-contained
 * record — a commit (with its operations) or a checkout (pointer move) —
 * and replaying the lines in order reconstructs the exact `TableState`.
 *
 * The reference keeps its log in memory only
 * (`core/src/main/scala/com/gu/tableversions/core/InMemoryTableVersions.scala:11-13`
 * — "Does not persist state") and relies on the metastore as durable truth;
 * this impl adds the durability the reference lacks (SURVEY.md §7.2 step 2).
 *
 * Crash safety: every mutation rewrites the file via temp-file +
 * ATOMIC_MOVE rename, so readers never observe a torn log.
 *
 * Concurrency: mutations take a per-table create-exclusive lock file
 * (optimistic, bounded retries) so concurrent writers — threads or
 * processes — serialize their read-modify-rename cycles instead of losing
 * updates. Readers never lock; the atomic rename keeps them consistent. A
 * crashed writer's stale lock is broken after [[JsonFileTableVersions.LockTimeoutMs]].
 */
final class JsonFileTableVersions(logDir: Path) extends TableVersions {
  import JsonFileTableVersions.{LockRetryMs, LockTimeoutMs}

  Files.createDirectories(logDir)
  private val mapper = new ObjectMapper()

  private def fileFor(table: TableName): Path =
    logDir.resolve(s"${table.fullyQualifiedName}.jsonl")

  // ------------------------------------------------------------- encoding

  private def opToJson(node: ObjectNode, op: TableOperation): ObjectNode = {
    import TableOperation._
    op match {
      case InitTable(name, snap) =>
        node.put("op", "init").put("table", name.fullyQualifiedName).put("snapshot", snap)
      case AddTableVersion(v) =>
        node.put("op", "add-table-version").put("version", v.label)
      case AddPartitionVersion(p, v) =>
        node.put("op", "add-partition-version").put("partition", p.hivePath).put("version", v.label)
      case RemovePartition(p) =>
        node.put("op", "remove-partition").put("partition", p.hivePath)
    }
  }

  private def opFromJson(node: ObjectNode): TableOperation = {
    import TableOperation._
    def partition = Partition.parse(node.get("partition").asText()).fold(sys.error, identity)
    def version   = Version.parse(node.get("version").asText()).fold(sys.error, identity)
    node.get("op").asText() match {
      case "init" =>
        val name = TableName.fromFullyQualified(node.get("table").asText()).fold(sys.error, identity)
        InitTable(name, node.get("snapshot").asBoolean())
      case "add-table-version"     => AddTableVersion(version)
      case "add-partition-version" => AddPartitionVersion(partition, version)
      case "remove-partition"      => RemovePartition(partition)
      case other                   => sys.error(s"unknown log operation: $other")
    }
  }

  private def commitLine(update: TableUpdate): String = {
    val node = mapper.createObjectNode()
    node.put("record", "commit")
    node.put("id", update.metadata.id.id)
    node.put("user", update.metadata.userId.value)
    node.put("message", update.metadata.message.content)
    node.put("timestamp", update.metadata.timestamp.toString)
    val ops = node.putArray("operations")
    update.operations.foreach(op => ops.add(opToJson(mapper.createObjectNode(), op)))
    mapper.writeValueAsString(node)
  }

  private def checkoutLine(id: CommitId): String = {
    val node = mapper.createObjectNode()
    node.put("record", "checkout").put("id", id.id)
    mapper.writeValueAsString(node)
  }

  // -------------------------------------------------------------- replay

  /** Replay the file into (updates, pointer). Missing file → None. */
  private def loadState(table: TableName): Option[TableState] = {
    val f = fileFor(table)
    if (!Files.exists(f)) None
    else {
      val lines = Files.readAllLines(f, StandardCharsets.UTF_8)
      var updates = List.empty[TableUpdate]
      var pointer: Option[CommitId] = None
      lines.forEach { line =>
        if (line.nonEmpty) {
          val node = mapper.readTree(line).asInstanceOf[ObjectNode]
          node.get("record").asText() match {
            case "commit" =>
              val meta = TableUpdateMetadata(
                CommitId(node.get("id").asText()),
                UserId(node.get("user").asText()),
                UpdateMessage(node.get("message").asText()),
                Instant.parse(node.get("timestamp").asText()))
              val ops = node.get("operations").asInstanceOf[ArrayNode]
              val parsed = (0 until ops.size()).toList
                .map(i => opFromJson(ops.get(i).asInstanceOf[ObjectNode]))
              updates = updates :+ TableUpdate(meta, parsed)
              pointer = Some(meta.id)
            case "checkout" =>
              pointer = Some(CommitId(node.get("id").asText()))
            case other => sys.error(s"unknown log record: $other")
          }
        }
      }
      pointer.map(p => TableState(p, updates))
    }
  }

  private def appendLines(table: TableName, lines: Seq[String]): Unit = {
    val f = fileFor(table)
    val existing =
      if (Files.exists(f)) Files.readString(f, StandardCharsets.UTF_8) else ""
    val tmp = Files.createTempFile(logDir, s".${table.fullyQualifiedName}", ".tmp")
    Files.writeString(tmp, existing + lines.mkString("", "\n", "\n"))
    Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Serialize a read-modify-rename cycle under a create-exclusive lock
    * file carrying a unique owner token.
    *
    * Guarantee (and its limit): critical sections here are small-file reads
    * and an atomic rename — milliseconds — and `LockTimeoutMs` (30 s) is the
    * liveness bound a holder must finish within; a lock older than that is
    * treated as a crashed holder's. Breaking is itself race-free: the
    * breaker must win an ATOMIC_MOVE of the stale lock to a unique name, so
    * of N waiters exactly one breaks it and the others loop back to the
    * create-exclusive acquire. Release deletes the lock only while it still
    * carries our token. */
  private def withTableLock[A](table: TableName)(body: => A): A = {
    val lock = logDir.resolve(s".${table.fullyQualifiedName}.lock")
    val token = java.util.UUID.randomUUID().toString
    var acquired = false
    while (!acquired) {
      try {
        Files.write(lock, token.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val stale =
            try {
              val age = System.currentTimeMillis() -
                Files.getLastModifiedTime(lock).toMillis
              age > LockTimeoutMs
            } catch { case _: java.io.IOException => false } // lock vanished — retry
          if (stale) {
            // atomic break: only the waiter whose rename succeeds removes
            // the corpse; a lost race means someone else broke or holds it
            val corpse = logDir.resolve(s"${lock.getFileName}.broken.${java.util.UUID.randomUUID()}")
            try {
              Files.move(lock, corpse, StandardCopyOption.ATOMIC_MOVE)
              Files.deleteIfExists(corpse)
            } catch { case _: java.io.IOException => () }
          } else Thread.sleep(LockRetryMs)
      }
    }
    try body
    finally {
      try {
        if (Files.exists(lock) &&
          new String(Files.readAllBytes(lock), StandardCharsets.UTF_8) == token)
          Files.deleteIfExists(lock)
      } catch { case _: java.io.IOException => () }
    }
  }

  // ------------------------------------------------------------ contract

  override def commit(table: TableName, update: TableUpdate): Unit =
    withTableLock(table) {
      if (loadState(table).isEmpty) throw unknownTableError(table)
      appendLines(table, Seq(commitLine(update)))
    }

  override def setCurrentVersion(table: TableName, id: CommitId): Unit =
    withTableLock(table) {
      val state = loadState(table).getOrElse(throw unknownTableError(table))
      if (!state.updates.exists(_.metadata.id == id)) throw unknownCommitId(id)
      appendLines(table, Seq(checkoutLine(id)))
    }

  override protected def tableState(table: TableName): TableState =
    loadState(table).getOrElse(throw unknownTableError(table))

  override protected def handleInit(table: TableName)(newTableState: => TableState): Unit =
    withTableLock(table) {
      if (loadState(table).isEmpty) {
        val state = newTableState
        appendLines(table, state.updates.map(commitLine))
      }
    }
}

object JsonFileTableVersions {
  private[core] val LockTimeoutMs = 30000L
  private[core] val LockRetryMs = 5L

  def apply(logDir: String): JsonFileTableVersions =
    new JsonFileTableVersions(Paths.get(logDir))
}
