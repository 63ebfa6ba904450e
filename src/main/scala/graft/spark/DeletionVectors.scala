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
  private val AbsorbedMarker = "_absorbed"

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
    * same bound as partition discovery. Public: the SQL catalog uses it to
    * REFUSE delegate file scans that cannot apply vectors, and rewrite
    * paths use it to decide whether the DV anti-join is needed at all. */
  def sidecarFor(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      at: Option[CommitId]): Option[String] =
    sidecarFor(spark.sessionState.newHadoopConf(), log, table, at)

  /** Session-free variant for callers that already hold a hadoop
    * Configuration (vacuum runs driver-side without needing a session).
    * An `_absorbed` MARKER sidecar (written by a full rewrite — OPTIMIZE /
    * Z-order) resolves to None: the walk stops there, so the older pair
    * sidecars stay live for time travel but no longer apply to states at
    * or after the rewrite. */
  def sidecarFor(
      conf: org.apache.hadoop.conf.Configuration,
      log: TableVersions,
      table: TableDefinition,
      at: Option[CommitId]): Option[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(table.location, conf)
    sidecarDirAt(fs, log, table, at)
      .filterNot(dir => fs.exists(new org.apache.hadoop.fs.Path(dir, AbsorbedMarker)))
  }

  /** The RAW nearest at-or-before sidecar dir — marker or pairs. Vacuum
    * retention must use this (not [[sidecarFor]]): reclaiming a marker dir
    * because "no vectors apply" would re-expose the older pair sidecar it
    * shields to every current read. */
  private[spark] def sidecarDirAt(
      fs: org.apache.hadoop.fs.FileSystem,
      log: TableVersions,
      table: TableDefinition,
      at: Option[CommitId]): Option[String] =
    lineage(log, table, at).iterator
      .map(m => deletesDir(table, m.id))
      .find(dir => fs.exists(new org.apache.hadoop.fs.Path(dir)))

  /** Record that a FULL rewrite (every partition's version moved, or a
    * snapshot replace) just landed as the current commit: any previously
    * live vectors are physically absorbed — the rewritten files carry only
    * surviving rows — so an `_absorbed` marker sidecar at the rewrite
    * commit stops the resolution walk there. Callers must NOT invoke this
    * after a PARTIAL rewrite (untouched partitions still need the old
    * pairs). No-op when no vectors were live. */
  def markAbsorbed(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    if (sidecarFor(conf, log, table, None).isEmpty) return // nothing live
    val fs = org.apache.hadoop.fs.FileSystem.get(table.location, conf)
    val dir = new org.apache.hadoop.fs.Path(
      deletesDir(table, log.currentCommit(table.name)))
    fs.mkdirs(dir)
    fs.create(new org.apache.hadoop.fs.Path(dir, AbsorbedMarker), true).close()
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

  /** DV-aware partition-scoped read — what every PARTITION-GRANULAR
    * copy-on-write rewrite (MERGE, UPDATE, DELETE, INSERT's carry-union,
    * Z-order) must scan instead of the raw [[VersionedReader]]: a raw read
    * would materialize DV-hidden rows into the rewritten files,
    * RESURRECTING them. Vectors match rows by (file, pos), so a rewrite
    * reading through here absorbs the touched partitions' vectors while
    * the carried sidecar keeps applying to untouched partitions' original
    * files — both sides stay correct with no sidecar rewrite. */
  def readPartitions(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      parts: Seq[Partition]): DataFrame = {
    val base = VersionedReader(spark, log).readPartitions(table, parts)
    sidecarFor(spark, log, table, None) match {
      case None => base
      case Some(dir) =>
        if (base.columns.isEmpty) base
        else {
          val withPtr = base.select(
            col("*"),
            col("_metadata.file_path").as(FileCol),
            col("_metadata.row_index").as(PosCol))
          val dv = spark.read.parquet(dir)
          withPtr
            .join(dv, withPtr(FileCol) === dv("file") && withPtr(PosCol) === dv("pos"), "left_anti")
            .drop(FileCol, PosCol)
        }
    }
  }

  /** Guard to run BEFORE [[TableVersions]] log checkpointing on a table
    * that may carry deletion vectors. Sidecars anchor to COMMIT IDS, and a
    * checkpoint folds old ids out of the history — if the id a retained
    * state resolves its sidecar through is folded away, the at-or-before
    * walk misses the sidecar and every DV-deleted row silently reappears.
    * This refuses loudly when any retained state (the base, the tail, or
    * the current pointer) resolves to a sidecar whose anchor would fold;
    * the remedies are the message's: OPTIMIZE first (compaction absorbs
    * the vectors into rewritten files, after which the old anchors age out
    * of every retained lineage) or raise keepLast. The core log layer
    * cannot run this check itself — it has no filesystem access to the
    * table location — which is why it lives here. */
  def requireCheckpointKeepsVectors(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      keepLast: Int): Unit = {
    val updates = log.updates(table.name) // most recent first
    if (updates.size <= keepLast + 1) return // checkpoint would no-op
    val retained = updates.take(keepLast + 1)
    val retainedIds = retained.map(_.id).toSet
    (log.currentCommit(table.name) :: retained.map(_.id)).distinct.foreach { c =>
      sidecarFor(spark, log, table, Some(c)).foreach { dir =>
        val anchor = dir.substring(dir.lastIndexOf("commit-") + "commit-".length)
        if (!retainedIds.contains(CommitId(anchor)))
          throw new IllegalStateException(
            s"checkpoint(keepLast=$keepLast) would fold away commit $anchor, which " +
              s"anchors the deletion-vector sidecar $dir still serving retained " +
              "states; run OPTIMIZE to absorb the vectors first, or raise keepLast")
      }
    }
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
    // OCC anchor, captured BEFORE the sidecar read: the delete is a
    // read-modify-write of the cumulative sidecar, so two racing deletes
    // reading the same previous sidecar would each union only their own
    // pairs — whichever landed second would silently UNDELETE the first's
    // rows. commitIf against this pointer resolves races to one winner and
    // one loud, retryable refusal (the engine's q57 posture).
    val expected = log.currentCommit(table.name)
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
      val dir = deletesDir(table, id)
      cumulative.write.mode("overwrite").parquet(dir)
      val committed = ctx.metastore.commitIf(
        table.name,
        TableUpdate(TableUpdateMetadata(id, user, message, java.time.Instant.now()), Nil),
        expected)
      if (committed.isEmpty) {
        // loser cleans its never-referenced sidecar (best-effort — vacuum
        // reclaims it regardless) and refuses loudly; the caller retries
        // against the new state
        try {
          val conf = spark.sessionState.newHadoopConf()
          val fs = org.apache.hadoop.fs.FileSystem.get(table.location, conf)
          fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        } catch { case _: java.io.IOException => () }
        throw new java.util.ConcurrentModificationException(
          s"concurrent commit moved ${table.name.fullyQualifiedName} past ${expected.id} " +
            "during a deletion-vector delete; retry the delete against the new state")
      }
      n
    } finally { newPairs.unpersist(); () }
  }
}
