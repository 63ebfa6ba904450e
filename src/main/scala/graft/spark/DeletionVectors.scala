package graft.spark

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core._
import graft.core.TableVersions.{CommitId, TableUpdate, TableUpdateMetadata, UpdateMessage, UserId}

/**
 * MERGE-ON-READ deletes (deletion vectors) — the scattered-row DELETE that
 * copy-on-write can't afford: a predicate touching a few rows in EVERY
 * partition of a 100 TB table would rewrite the whole table under the
 * copy-on-write DML path ([[GraftDeleteCommand]]); here it writes a
 * metadata-sized sidecar and ZERO data files. The Delta deletion-vector /
 * Iceberg positional-delete pattern, expressed on this engine's
 * per-commit-sidecar layout (the same `_stats/commit-<id>` lifecycle
 * [[FileStats]] uses):
 *
 *  - a DV DELETE scans the current state WITH parquet's `_metadata`
 *    columns, collects the matching rows' `(file, pos)` pairs as a
 *    DataFrame (never driver-side — deletes can be row-scale), unions them
 *    with the previous cumulative sidecar, and writes the result to
 *    `<table>/_deletes/commit-<id>`;
 *  - the commit itself carries NO operations: no version pointer moves, no
 *    data file is written — it just advances the pointer so the delete is
 *    an ordinary time-travelable history entry;
 *  - a merge-on-read scan applies exactly ONE sidecar — the nearest
 *    at-or-before commit that has one (sidecars are CUMULATIVE, so no
 *    union-walk over history) — as a `(file, pos)` anti-join against the
 *    scan's own `_metadata` columns. Version dirs are immutable, so row
 *    positions are stable by construction.
 *
 * Interplay with the rest of the engine:
 *  - TIME TRAVEL: a read as-of a pre-delete commit finds no at-or-before
 *    sidecar (or an older cumulative one) and shows the pre-delete rows.
 *  - OPTIMIZE / copy-on-write DML: a rewrite commits new version dirs with
 *    new file paths; DV pairs referencing the replaced files become
 *    dead no-ops (the anti-join misses), which is exactly how compaction
 *    "absorbs" deletion vectors — rewritten partitions carry their
 *    surviving rows physically. NOTE: compaction planners must read
 *    through [[read]] (not the raw [[VersionedReader]]) or they would
 *    resurrect DV-hidden rows into the rewritten files.
 *  - VACUUM: sidecars follow their commit's lifecycle like `_stats`
 *    sidecars; an orphaned sidecar (commit never landed) is reclaimable.
 */
object DeletionVectors {

  private val FileCol = "__dv_file"
  private val PosCol = "__dv_pos"

  private def deletesDir(table: TableDefinition, id: CommitId): String =
    Partition.normalizedDir(table.location).toString + "_deletes/commit-" + id.id

  /** The commits at or before `at` (default: the CURRENT POINTER — not the
    * log head; after a rollback the head's deletes are not visible), most
    * recent first. */
  private def lineage(
      log: TableVersions, table: TableDefinition, at: Option[CommitId]): List[TableUpdateMetadata] = {
    val pointer = at.getOrElse(log.currentCommit(table.name))
    log.updates(table.name).dropWhile(_.id != pointer)
  }

  /** The nearest at-or-before cumulative sidecar directory, if any. The
    * walk is O(#commits) driver-side existence checks — metadata-scale,
    * same bound as partition discovery. */
  private def sidecarFor(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      at: Option[CommitId]): Option[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = org.apache.hadoop.fs.FileSystem.get(table.location, conf)
    lineage(log, table, at).iterator
      .map(m => deletesDir(table, m.id))
      .find(dir => fs.exists(new org.apache.hadoop.fs.Path(dir)))
  }

  /** The DV-filtered scan WITH its `(file, pos)` pointer columns still
    * attached — `_metadata` resolves only on the scan relation itself, so
    * anything that needs row pointers (the delete path) must capture them
    * here, before the anti-join. */
  private def readWithPointers(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      asOf: Option[CommitId]): DataFrame = {
    val reader = VersionedReader(spark, log)
    val base = asOf.map(reader.readAsOf(table, _)).getOrElse(reader.read(table))
    if (base.columns.isEmpty) return base
    val withPtr = base.select(
      col("*"),
      col("_metadata.file_path").as(FileCol),
      col("_metadata.row_index").as(PosCol))
    sidecarFor(spark, log, table, asOf) match {
      case None => withPtr
      case Some(dir) =>
        val dv = spark.read.parquet(dir)
        withPtr
          .join(dv, withPtr(FileCol) === dv("file") && withPtr(PosCol) === dv("pos"), "left_anti")
    }
  }

  /** Merge-on-read scan: the state at `asOf` (default current) minus every
    * `(file, pos)` in the applicable cumulative deletion sidecar. One
    * shuffled anti-join (AQE broadcasts it when the sidecar is small);
    * zero extra cost when the table has no deletion vectors. */
  def read(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      asOf: Option[CommitId] = None): DataFrame = {
    val df = readWithPointers(spark, log, table, asOf)
    if (df.columns.isEmpty) df else df.drop(FileCol, PosCol)
  }

  /** Merge-on-read DELETE: hide every current row matching `cond` (SQL
    * semantics — NULL predicates don't match) behind a fresh cumulative
    * sidecar + an empty-ops commit. Writes NO data files and moves NO
    * version pointers. Returns the number of newly deleted row positions;
    * a no-match delete commits nothing. The sidecar is written BEFORE the
    * commit that publishes it — a crash in between leaves an orphaned,
    * never-referenced sidecar (the versioned write path's own staging
    * posture). */
  def delete(
      ctx: VersionContext,
      log: TableVersions,
      table: TableDefinition,
      cond: Column,
      user: UserId,
      message: UpdateMessage): Long = {
    val spark = org.apache.spark.sql.SparkSession.active
    // match against the VISIBLE state (existing DVs applied): re-deleting
    // an already-hidden row must not inflate the count
    val visible = readWithPointers(spark, log, table, None)
    if (visible.columns.isEmpty) return 0L
    val newPairs = visible
      .where(cond)
      .select(col(FileCol).as("file"), col(PosCol).as("pos"))
      .persist()
    try {
      val n = newPairs.count()
      if (n == 0L) return 0L
      val cumulative = sidecarFor(spark, log, table, None) match {
        case None       => newPairs
        case Some(prev) => spark.read.parquet(prev).unionByName(newPairs).distinct()
      }
      val id = CommitId(UUID.randomUUID().toString)
      cumulative.write.mode("overwrite").parquet(deletesDir(table, id))
      ctx.metastore.commit(table.name, TableUpdate(
        TableUpdateMetadata(id, user, message, java.time.Instant.now()), Nil))
      n
    } finally { newPairs.unpersist(); () }
  }
}
