package graft.core

import java.util.concurrent.atomic.AtomicReference
import scala.annotation.tailrec

import TableVersions._

/**
 * In-memory commit log guarded by an `AtomicReference` CAS loop. Does not
 * persist state.
 *
 * Mirrors the reference implementation's `InMemoryTableVersions`
 * (`core/src/main/scala/com/gu/tableversions/core/InMemoryTableVersions.scala:11-71`),
 * with `AtomicReference` replacing cats-effect `Ref` + `modifyEither`
 * (`core/.../util/RichRef.scala:17-24`).
 */
final class InMemoryTableVersions extends TableVersions {

  private val ref = new AtomicReference[Map[TableName, TableState]](Map.empty)

  @tailrec
  private def modify(f: Map[TableName, TableState] => Either[Exception, Map[TableName, TableState]]): Unit = {
    val current = ref.get()
    f(current) match {
      case Left(e) => throw e
      case Right(updated) =>
        if (!ref.compareAndSet(current, updated)) modify(f)
    }
  }

  override def commit(table: TableName, update: TableUpdate): Unit =
    modify { states =>
      states.get(table) match {
        case None => Left(unknownTableError(table))
        case Some(state) if state.updates.exists(_.metadata.id == update.metadata.id) =>
          // ids resolve by first occurrence in the fold — a duplicate would
          // silently point "current" at the OLD commit (see the file log
          // impl for the same guard)
          Left(new IllegalArgumentException(
            s"commit id ${update.metadata.id.id} already exists in the history of ${table.fullyQualifiedName}"))
        case Some(state) =>
          val newState =
            TableState(currentVersion = update.metadata.id, updates = state.updates :+ update)
          Right(states + (table -> newState))
      }
    }

  override def commitIf(
      table: TableName, update: TableUpdate, expected: CommitId): Boolean = {
    // the flag rides the CAS loop: only the attempt that wins the
    // compareAndSet leaves its value behind
    var applied = false
    modify { states =>
      states.get(table) match {
        case None => Left(unknownTableError(table))
        case Some(state) if state.updates.exists(_.metadata.id == update.metadata.id) =>
          Left(new IllegalArgumentException(
            s"commit id ${update.metadata.id.id} already exists in the history of ${table.fullyQualifiedName}"))
        case Some(state) if state.currentVersion != expected =>
          applied = false
          Right(states) // conflict: another writer moved the pointer — no-op
        case Some(state) =>
          applied = true
          Right(states + (table ->
            TableState(currentVersion = update.metadata.id, updates = state.updates :+ update)))
      }
    }
    applied
  }

  override def setCurrentVersion(table: TableName, id: CommitId): Unit =
    modify { states =>
      states.get(table) match {
        case None => Left(unknownTableError(table))
        case Some(state) =>
          if (state.updates.exists(_.metadata.id == id))
            Right(states + (table -> state.copy(currentVersion = id)))
          else Left(unknownCommitId(id))
      }
    }

  override def commitDetached(table: TableName, update: TableUpdate): Unit =
    modify { states =>
      states.get(table) match {
        case None => Left(unknownTableError(table))
        case Some(state) if state.updates.exists(_.metadata.id == update.metadata.id) =>
          Left(new IllegalArgumentException(
            s"commit id ${update.metadata.id.id} already exists in the history of ${table.fullyQualifiedName}"))
        case Some(state) =>
          // the pointer does NOT move — that is the branch-write contract
          Right(states + (table -> state.copy(updates = state.updates :+ update)))
      }
    }

  override def setRef(table: TableName, name: String, id: CommitId, isTag: Boolean): Unit =
    modify { states =>
      states.get(table) match {
        case None => Left(unknownTableError(table))
        case Some(state) =>
          try {
            validateRef(state, name, id, isTag)
            Right(states + (table -> state.copy(refs = state.refs + (name -> RefEntry(id, isTag)))))
          } catch { case e: Exception => Left(e) }
      }
    }

  override def deleteRef(table: TableName, name: String): Unit =
    modify { states =>
      states.get(table) match {
        case None => Left(unknownTableError(table))
        case Some(state) if !state.refs.contains(name) =>
          Left(new IllegalArgumentException(
            s"table ${table.fullyQualifiedName} has no ref named '$name'"))
        case Some(state) =>
          Right(states + (table -> state.copy(refs = state.refs - name)))
      }
    }

  override protected def tableState(table: TableName): TableState =
    ref.get().getOrElse(table, throw unknownTableError(table))

  override protected def handleInit(table: TableName)(newTableState: => TableState): Unit =
    modify { states =>
      if (states.contains(table)) Right(states)
      else Right(states + (table -> newTableState))
    }
}
