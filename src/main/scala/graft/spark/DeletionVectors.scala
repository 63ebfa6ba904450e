package graft.spark

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, col, lit, max}

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
 *    DataFrame (never driver-side — deletes can be row-scale), and writes a
 *    sidecar to `<table>/_deletes/commit-<id>` holding the full pair set
 *    for ONLY the files this delete touched (previous pairs for those
 *    files folded in). Untouched files' pairs stay in their older
 *    sidecars — write cost per DELETE is O(deletes in the touched files),
 *    NOT O(all rows ever deleted), which is what makes N scattered deletes
 *    O(N·k) total instead of O(N²·k);
 *  - the commit itself carries NO operations: no version pointer moves, no
 *    data file is written — it just advances the pointer so the delete is
 *    an ordinary time-travelable history entry;
 *  - a merge-on-read scan resolves the vectors PER FILE, LATEST WINS: of
 *    every at-or-before sidecar (walking back until a full-rewrite
 *    `_absorbed` marker), the newest sidecar mentioning a file owns that
 *    file's pair set. One union + one windowed latest-wins filter + one
 *    `(file, pos)` anti-join against the scan's own `_metadata` columns.
 *    Version dirs are immutable, so row positions are stable by
 *    construction. A row with `pos = -1` is a per-file TOMBSTONE: "this
 *    file's vectors are absorbed as of this commit" — how partition-scoped
 *    rewrites shed dead vectors ([[absorbStale]]) without a full-rewrite
 *    marker.
 *
 * Backward compatibility: the previous format wrote CUMULATIVE sidecars
 * (all live pairs at each delete). A cumulative sidecar carries the full
 * pair set for every file it mentions, so per-file latest-wins resolves
 * mixed histories correctly with no migration.
 *
 * Interplay with the rest of the engine:
 *  - TIME TRAVEL: a read as-of a pre-delete commit resolves only the
 *    sidecars at-or-before that commit and shows the pre-delete rows.
 *    Tombstones written by later rewrites are equally invisible to it.
 *  - OPTIMIZE / copy-on-write DML: a rewrite commits new version dirs with
 *    new file paths; DV pairs referencing the replaced files become
 *    dead no-ops (the anti-join misses). A FULL rewrite records an
 *    `_absorbed` marker ([[markAbsorbed]]) that stops the resolution walk;
 *    a PARTIAL rewrite tombstones just the files it replaced
 *    ([[absorbStale]]). NOTE: rewrite planners must read through [[read]]
 *    (not the raw [[VersionedReader]]) or they would resurrect DV-hidden
 *    rows into the rewritten files.
 *  - VACUUM: sidecars follow their commit's lifecycle like `_stats`
 *    sidecars; an orphaned sidecar (commit never landed) is reclaimable.
 *  - Sidecar-dir count grows with delete commits until a full rewrite;
 *    [[squashSidecars]] folds every live group into one sidecar so reads
 *    open O(1) dirs again — the DV analogue of log checkpointing.
 */
object DeletionVectors {

  private val FileCol = "__dv_file"
  private val PosCol = "__dv_pos"
  private val SeqCol = "__dv_seq"
  private val AbsorbedMarker = "_absorbed"

  /** Marks a sidecar as carrying the COMPLETE vector state for its commit
    * (written by [[squashSidecars]]): the resolution walk includes it and
    * stops, so reads open O(1) sidecar dirs however many delete commits
    * preceded it. Parquet scans ignore `_`-prefixed files, so the marker
    * is invisible to the pair read itself. */
  private val SquashedMarker = "_squashed"

  /** Per-file tombstone position: after latest-wins resolution, a group
    * whose rows are all `< 0` contributes no vectors. */
  private val Tombstone = -1L

  private def deletesDir(table: TableDefinition, id: CommitId): String =
    Partition.normalizedDir(table.location).toString + "_deletes/commit-" + id.id

  private[spark] def deletesDirFor(table: TableDefinition, id: CommitId): String =
    deletesDir(table, id)

  /** Write `(file, pos)` pairs into the sidecar anchored at `anchor` — the
    * merge-on-read UPDATE/append path ([[RowOverlay.append]]) stages its
    * preimage-hiding vectors at its own commit id BEFORE that commit lands
    * (invisible until referenced, orphaned-for-vacuum on a lost race). The
    * caller is responsible for the per-file completeness contract: pairs
    * for a file this sidecar mentions must be that file's FULL live set
    * (latest-wins resolution makes the newest mention authoritative). */
  private[spark] def writePairsAt(
      spark: SparkSession,
      table: TableDefinition,
      pairs: DataFrame,
      anchor: CommitId): Unit =
    writeSidecar(spark, table, pairs, anchor)

  /** The commits at or before `at` (default: the CURRENT POINTER — not the
    * log head; after a rollback the head's deletes are not visible), most
    * recent first. */
  private def lineage(
      log: TableVersions, table: TableDefinition, at: Option[CommitId]): List[TableUpdateMetadata] = {
    val pointer = at.getOrElse(log.currentCommit(table.name))
    log.updates(table.name).dropWhile(_.id != pointer)
  }

  /** Every sidecar dir CONTRIBUTING to the state at `at`, oldest first:
    * the existing at-or-before dirs, walking back until a full-rewrite
    * `_absorbed` marker (excluded — no vectors apply past it) or a
    * `_squashed` sidecar (included — it carries the complete state). The
    * walk is O(#commits) driver-side existence checks — metadata-scale,
    * same bound as partition discovery. */
  private[graft] def liveSidecarDirs(
      fs: org.apache.hadoop.fs.FileSystem,
      log: TableVersions,
      table: TableDefinition,
      at: Option[CommitId]): List[String] =
    rawSidecarDirs(fs, log, table, at)
      .filterNot(dir => fs.exists(new org.apache.hadoop.fs.Path(dir, AbsorbedMarker)))
      .reverse

  /** The RAW at-or-before sidecar dirs, most recent first, stopping AT
    * (inclusive) the first `_absorbed` or `_squashed` marker. Vacuum
    * retention and the checkpoint guard share this with resolution: a
    * marker dir is as load-bearing as a pair sidecar — reclaiming or
    * folding it would re-expose the older pairs it shields to every
    * current read. */
  private[spark] def rawSidecarDirs(
      fs: org.apache.hadoop.fs.FileSystem,
      log: TableVersions,
      table: TableDefinition,
      at: Option[CommitId]): List[String] = {
    val existing = lineage(log, table, at).iterator
      .map(m => deletesDir(table, m.id))
      .filter(dir => fs.exists(new org.apache.hadoop.fs.Path(dir)))
    val (before, rest) = existing.span { dir =>
      !fs.exists(new org.apache.hadoop.fs.Path(dir, AbsorbedMarker)) &&
      !fs.exists(new org.apache.hadoop.fs.Path(dir, SquashedMarker))
    }
    before.toList ++ rest.toList.take(1)
  }

  /** Whether any deletion-vector sidecar applies to the state at `at` —
    * the cheap probe the SQL catalog / scan rule use to decide whether a
    * raw delegate scan is safe. Contributing dirs may resolve to zero live
    * pairs (all tombstoned) — the rewrite is then a no-op anti-join, still
    * correct. */
  def hasVectors(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      at: Option[CommitId]): Boolean = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = org.apache.hadoop.fs.FileSystem.get(table.location, conf)
    liveSidecarDirs(fs, log, table, at).nonEmpty
  }

  /** The resolved live `(file, pos)` pair set for the state at `at`:
    * per-file latest-wins across every contributing sidecar, tombstones
    * dropped. None when no sidecar contributes. Sidecars are
    * metadata-sized next to the data they annotate; the latest-wins window
    * runs distributed and AQE broadcasts the result into the scan
    * anti-join when small. */
  private[graft] def resolvePairs(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      at: Option[CommitId]): Option[DataFrame] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = org.apache.hadoop.fs.FileSystem.get(table.location, conf)
    val dirs = liveSidecarDirs(fs, log, table, at) // oldest first
    if (dirs.isEmpty) None
    else if (dirs.sizeIs == 1)
      Some(
        spark.read.parquet(dirs.head)
          .where(col("pos") >= 0L).select(col("file"), col("pos")))
    else {
      val unioned = dirs.zipWithIndex
        .map { case (d, i) =>
          spark.read.parquet(d).select(col("file"), col("pos"), lit(i).as(SeqCol))
        }
        .reduce(_ unionByName _)
      val w = Window.partitionBy(col("file"))
      Some(
        unioned
          .withColumn("__dv_max", max(col(SeqCol)).over(w))
          .where(col(SeqCol) === col("__dv_max") && col("pos") >= 0L)
          .select(col("file"), col("pos")))
    }
  }

  /** Record that a FULL rewrite (every partition's version moved, or a
    * snapshot replace) just landed as the current commit: any previously
    * live vectors are physically absorbed — the rewritten files carry only
    * surviving rows — so an `_absorbed` marker sidecar at the rewrite
    * commit stops the resolution walk there. Callers must NOT invoke this
    * after a PARTIAL rewrite (untouched partitions still need the old
    * pairs) — use [[absorbStale]] there. No-op when no vectors were
    * live. */
  def markAbsorbed(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = org.apache.hadoop.fs.FileSystem.get(table.location, conf)
    if (liveSidecarDirs(fs, log, table, None).isEmpty) return // nothing live
    val dir = new org.apache.hadoop.fs.Path(
      deletesDir(table, log.currentCommit(table.name)))
    fs.mkdirs(dir)
    fs.create(new org.apache.hadoop.fs.Path(dir, AbsorbedMarker), true).close()
  }

  /** PARTIAL-rewrite absorption: tombstone every sidecar file group whose
    * file is no longer referenced by the CURRENT table version (its
    * version dir was replaced by a partition-scoped OPTIMIZE / Z-order /
    * copy-on-write rewrite). The dead groups' pairs were already harmless
    * no-ops (the anti-join misses replaced paths); tombstoning stops every
    * future read from carrying them through the union — a DV-heavy
    * partition's vectors are SHED the moment it is compacted, not only at
    * the next full rewrite. Tombstones anchor to the current (rewrite)
    * commit, so time travel to pre-rewrite states still resolves the old
    * pairs. Returns the number of file groups tombstoned.
    *
    * Like [[markAbsorbed]], assumes no concurrent rollback: "dead" is
    * judged against the current version's referenced dirs at call time.
    * The distinct-file collect is file-list-scale — the same driver-side
    * bound as [[FileStats]] scan planning. */
  def absorbStale(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition): Long = {
    val pairs = resolvePairs(spark, log, table, None).getOrElse(return 0L)
    val files = pairs.select(col("file")).distinct()
      .collect().map(_.getString(0)).toList
    if (files.isEmpty) return 0L
    // a sidecar file is LIVE iff its path sits under a version dir the
    // current state references — match on the `<escapedPartition>/<label>`
    // segment, the same rendering Vacuum retention uses (labels embed a
    // timestamp + random id, so segment collision is not a concern)
    val referenced: Set[String] = log.currentVersion(table.name) match {
      case SnapshotTableVersion(v) => Set(v.label)
      case PartitionedTableVersion(pvs) =>
        pvs.map { case (p, v) =>
          s"${SparkPaths.escapedPartitionPath(p)}/${v.label}"
        }.toSet
    }
    // row-overlay files ([[RowOverlay]]) sit under `_appends`, never under
    // a version dir — but their pairs are LIVE as long as the dir's
    // (anchor, partition) contribution is: tombstoning them would
    // resurrect merge-on-read-deleted overlay rows into every read
    val overlayLive: List[String] = RowOverlay.contributions(spark, log, table, None)
      .flatMap { c =>
        c.leaves.map {
          case (Some(p), _) =>
            s"_appends/commit-${c.anchor.id}/${SparkPaths.escapedPartitionPath(p)}/"
          case (None, _) =>
            s"_appends/commit-${c.anchor.id}/"
        }
      }
    val dead = files.filterNot(f =>
      referenced.exists(r => f.contains(s"/$r/")) ||
        overlayLive.exists(seg => f.contains(s"/$seg")))
    if (dead.isEmpty) return 0L
    import spark.implicits._
    writeSidecar(
      spark, table,
      dead.map(f => (f, Tombstone)).toDF("file", "pos"),
      log.currentCommit(table.name))
    dead.size.toLong
  }

  /** DV maintenance: fold every contributing sidecar into ONE sidecar at
    * a fresh squash COMMIT (live groups carried, every older-mentioned
    * file without live pairs tombstoned), so subsequent reads open O(1)
    * sidecar dirs instead of one per delete commit — the DV analogue of
    * log checkpointing. Old sidecars stay on disk for time travel and
    * reclaim via [[Vacuum]] once their anchors age out of retention.
    * No-op (false) when 0 or 1 dirs contribute.
    *
    * CONCURRENCY ([[RowOverlay.squash]] posture): the fold resolves at an
    * anchor captured on entry and publishes through a strict `commitIf`
    * CAS against it — the sidecar is keyed by the NEW commit id (invisible
    * until the commit lands), no existing sidecar is touched, and any
    * concurrent delete/append/replace makes the CAS lose: the
    * never-referenced sidecar is removed and the squash refuses loudly. */
  def squashSidecars(
      spark: SparkSession,
      ctx: VersionContext,
      table: TableDefinition,
      user: UserId,
      message: UpdateMessage): Boolean = {
    val log = ctx.metastore.tableVersions
    val conf = spark.sessionState.newHadoopConf()
    val fs = org.apache.hadoop.fs.FileSystem.get(table.location, conf)
    val anchor = log.currentCommit(table.name)
    val dirs = liveSidecarDirs(fs, log, table, Some(anchor))
    if (dirs.sizeIs <= 1) return false
    // every mentioned file must appear in the squash: a live group by its
    // pairs, a dead/tombstoned group by a tombstone — otherwise the older
    // sidecar's entry would become "latest" again for that file
    val mentioned = dirs
      .map(d => spark.read.parquet(d).select(col("file")))
      .reduce(_ union _)
      .distinct()
    val live = resolvePairs(spark, log, table, Some(anchor))
      .getOrElse(return false)
    val tombstones = mentioned
      .join(live.select(col("file")).distinct(), Seq("file"), "left_anti")
      .withColumn("pos", lit(Tombstone))
    val commitId = CommitId(UUID.randomUUID().toString)
    writeSidecar(
      spark, table, live.unionByName(tombstones), commitId, squash = true)
    RowOverlay.interleaveSquashForTest.foreach(f => f())
    val update = TableUpdate(
      TableUpdateMetadata(commitId, user, message, java.time.Instant.now(), None), Nil)
    if (ctx.metastore.commitIf(table.name, update, anchor).isEmpty) {
      try { fs.delete(new org.apache.hadoop.fs.Path(deletesDirFor(table, commitId)), true); () }
      catch { case _: java.io.IOException => () }
      throw new TableVersions.ConcurrentWriteException(
        s"concurrent commit moved ${table.name.fullyQualifiedName} past ${anchor.id} " +
          "during a deletion-vector squash — nothing changed, re-run")
    }
    true
  }

  /** AUTO-SQUASH ([[RowOverlay.autoSquash]] posture): fold the pair
    * sidecars via [[squashSidecars]] when more than `maxDirs` contribute
    * to current reads; no-op below the threshold. Best-effort under
    * concurrency — the underlying squash refuses loudly on a racing
    * commit. Returns whether a squash happened. */
  def autoSquash(
      spark: SparkSession,
      ctx: VersionContext,
      table: TableDefinition,
      user: UserId,
      maxDirs: Int = 16): Boolean = {
    require(maxDirs >= 1, "autoSquash maxDirs must be >= 1")
    val log = ctx.metastore.tableVersions
    val fs = org.apache.hadoop.fs.FileSystem.get(
      table.location, spark.sessionState.newHadoopConf())
    if (liveSidecarDirs(fs, log, table, None).sizeIs <= maxDirs) false
    else squashSidecars(spark, ctx, table, user,
      UpdateMessage(s"AUTO SQUASH deletion vectors (>$maxDirs sidecars)"))
  }

  /** SHALLOW-CLONE carry: materialize the RESOLVED live pair state of
    * `table` at `at` as one COMPLETE (`_squashed`) sidecar anchored at
    * `anchor` — the clone's first state commit. The clone's lineage holds
    * none of the source's sidecar anchors, so it gets its own
    * consolidated sidecar under its own commit id; the shared `_deletes`
    * namespace keys by uuid commit ids, so the new dir is invisible to
    * the source's resolution walk (and vice versa) — fork isolation by
    * construction. No-op when the state carries no vectors. */
  private[spark] def cloneResolvedState(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      at: CommitId,
      anchor: CommitId): Unit =
    resolvePairs(spark, log, table, Some(at)).foreach { live =>
      // pairs on ROW-OVERLAY files are dropped: the clone carries the
      // RESOLVED overlay rows ([[RowOverlay.cloneResolvedState]] — hidden
      // rows already excluded there), and the carried pairs would point at
      // source overlay files the clone's overlay resolution never unions
      writeSidecar(
        spark, table,
        live.where(!col("file").contains("/_appends/")), anchor, squash = true)
    }

  /** Write (or fold into) the sidecar at `anchor` — a delete and a
    * same-commit absorb compose by union rather than clobbering, and a
    * pre-existing `_squashed` marker survives the fold (the union of a
    * complete state with more pairs is still complete). */
  private def writeSidecar(
      spark: SparkSession,
      table: TableDefinition,
      pairs: DataFrame,
      anchor: CommitId,
      squash: Boolean = false): Unit = {
    val dir = deletesDir(table, anchor)
    val conf = spark.sessionState.newHadoopConf()
    val fs = org.apache.hadoop.fs.FileSystem.get(table.location, conf)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val existed = fs.exists(dirPath)
    val out =
      if (existed) spark.read.parquet(dir).unionByName(pairs).distinct()
      else pairs
    val keepSquash = squash ||
      (existed && fs.exists(new org.apache.hadoop.fs.Path(dirPath, SquashedMarker)))
    // stage + rename: `overwrite` into a dir a concurrent reader may be
    // unioning would serve it a partial sidecar
    val staged = new org.apache.hadoop.fs.Path(
      dir + "-staging-" + UUID.randomUUID().toString)
    // sidecars are metadata-sized but RESOLVED ON EVERY READ (union +
    // latest-wins window over every contributing dir): land them as few
    // AQE-sized files, not one per upstream shuffle partition. Hash by
    // `file` — deterministic, and AQE coalesces to ~1 file at metadata
    // scale / splits if a pathological pair set ever gets big
    VersionContext.distributeForWrite(out, Seq("file"))
      .write.mode("overwrite").parquet(staged.toString)
    if (keepSquash)
      fs.create(new org.apache.hadoop.fs.Path(staged, SquashedMarker), true).close()
    fs.delete(dirPath, true)
    if (!fs.rename(staged, dirPath))
      throw new java.io.IOException(s"failed to publish deletion sidecar $dir")
  }

  /** The VISIBLE state (vectors applied, logical column names) with the
    * `(file, pos)` pointers still attached under the engine's internal
    * aliases — what row-level preimage collectors (the merge-on-read
    * UPDATE, [[RowOverlay.update]]) match predicates against. Pointer
    * columns pass through the mapping untouched (never mapped). */
  private[spark] def readVisiblePointed(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      asOf: Option[CommitId]): (DataFrame, String, String) =
    (ColumnMapping.applyLogical(
      readWithPointers(spark, log, table, asOf), spark, log, table, asOf),
      FileCol, PosCol)

  /** Partition-scoped twin of [[readVisiblePointed]] — the merge-on-read
    * MERGE's pruned target read. */
  private[spark] def readPartitionsVisiblePointed(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      parts: Seq[Partition]): (DataFrame, String, String) = {
    val reader = VersionedReader(spark, log)
    val withPtr = reader.readPartitionsPointed(table, parts, FileCol, PosCol)
    val dvApplied = resolvePairs(spark, log, table, None) match {
      case None => withPtr
      case Some(dv) =>
        if (withPtr.columns.isEmpty) withPtr
        else withPtr.join(
          dv, withPtr(FileCol) === dv("file") && withPtr(PosCol) === dv("pos"), "left_anti")
    }
    (ColumnMapping.applyLogical(dvApplied, spark, log, table, None), FileCol, PosCol)
  }

  /** Fold `newPairs` with the prior pairs of the files they touch — the
    * per-file-completeness discipline every sidecar write must keep (see
    * [[delete]]): the newest sidecar mentioning a file owns that file's
    * FULL pair set. */
  private[spark] def foldedPairs(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      newPairs: DataFrame): DataFrame = {
    val touched = newPairs.select(col("file")).distinct()
    resolvePairs(spark, log, table, None) match {
      case None => newPairs
      case Some(prev) =>
        prev
          .join(broadcast(touched), Seq("file"), "left_semi")
          .unionByName(newPairs)
          .distinct()
    }
  }

  /** The DV-filtered scan WITH its `(file, pos)` pointer columns still
    * attached — `_metadata` resolves only on the scan relation itself, so
    * anything that needs row pointers (the delete path) must capture them
    * here, before the anti-join. */
  private def readWithPointers(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      asOf: Option[CommitId],
      mergeSchema: Boolean = false): DataFrame = {
    val reader = VersionedReader(spark, log)
    // pointer capture happens INSIDE the reader, per era scan: `_metadata`
    // does not resolve through the union a mixed-era fold materializes as
    val withPtr = reader.readPointed(table, asOf, FileCol, PosCol, mergeSchema)
    if (withPtr.columns.isEmpty) return withPtr
    resolvePairs(spark, log, table, asOf) match {
      case None => withPtr
      case Some(dv) =>
        withPtr
          .join(dv, withPtr(FileCol) === dv("file") && withPtr(PosCol) === dv("pos"), "left_anti")
    }
  }

  /** Merge-on-read scan: the state at `asOf` (default current) minus every
    * live `(file, pos)` vector. One shuffled anti-join (AQE broadcasts it
    * when the vectors are small); zero extra cost when the table has no
    * deletion vectors. */
  def read(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      asOf: Option[CommitId] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val df = readWithPointers(spark, log, table, asOf, mergeSchema)
    if (df.columns.isEmpty) df else df.drop(FileCol, PosCol)
  }

  /** DV-aware partition-scoped read — what every PARTITION-GRANULAR
    * copy-on-write rewrite (MERGE, UPDATE, DELETE, INSERT's carry-union,
    * Z-order) must scan instead of the raw [[VersionedReader]]: a raw read
    * would materialize DV-hidden rows into the rewritten files,
    * RESURRECTING them. Vectors match rows by (file, pos), so a rewrite
    * reading through here absorbs the touched partitions' vectors while
    * the untouched partitions' sidecars keep applying to their original
    * files — both sides stay correct with no sidecar rewrite. */
  def readPartitions(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      parts: Seq[Partition]): DataFrame = {
    val reader = VersionedReader(spark, log)
    resolvePairs(spark, log, table, None) match {
      case None => reader.readPartitions(table, parts)
      case Some(dv) =>
        val withPtr = reader.readPartitionsPointed(table, parts, FileCol, PosCol)
        if (withPtr.columns.isEmpty) withPtr
        else withPtr
          .join(dv, withPtr(FileCol) === dv("file") && withPtr(PosCol) === dv("pos"), "left_anti")
          .drop(FileCol, PosCol)
    }
  }

  /** Guard to run BEFORE [[TableVersions]] log checkpointing on a table
    * that may carry deletion vectors. Sidecars anchor to COMMIT IDS, and a
    * checkpoint folds old ids out of the history — if an id a retained
    * state resolves its sidecars through is folded away, the at-or-before
    * walk misses that sidecar and its DV-deleted rows silently reappear.
    * This refuses loudly when any retained state (the base, the tail, or
    * the current pointer) resolves through a sidecar whose anchor would
    * fold; the remedies are the message's: OPTIMIZE first (compaction
    * absorbs the vectors, after which the old anchors age out of every
    * retained lineage), [[squashSidecars]] (re-anchors every live group at
    * the current commit), or raise keepLast. The core log layer cannot run
    * this check itself — it has no filesystem access to the table
    * location — which is why it lives here. */
  def requireCheckpointKeepsVectors(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition,
      keepLast: Int): Unit = {
    val updates = log.updates(table.name) // most recent first
    if (updates.size <= keepLast + 1) return // checkpoint would no-op
    val retained = updates.take(keepLast + 1)
    val retainedIds = retained.map(_.id).toSet
    val conf = spark.sessionState.newHadoopConf()
    val fs = org.apache.hadoop.fs.FileSystem.get(table.location, conf)
    (log.currentCommit(table.name) :: retained.map(_.id)).distinct.foreach { c =>
      rawSidecarDirs(fs, log, table, Some(c)).foreach { dir =>
        val anchor = dir.substring(dir.lastIndexOf("commit-") + "commit-".length)
        if (!retainedIds.contains(CommitId(anchor)))
          throw new IllegalStateException(
            s"checkpoint(keepLast=$keepLast) would fold away commit $anchor, which " +
              s"anchors the deletion-vector sidecar $dir still serving retained " +
              "states; run OPTIMIZE or DeletionVectors.squashSidecars to re-anchor " +
              "the vectors first, or raise keepLast")
      }
      // row-overlay dirs ([[RowOverlay]]) have the same anchor-resolution
      // dependency, PLUS their liveness rule needs `versionAt(anchor)` —
      // folding an overlay anchor away breaks both
      RowOverlay.rawOverlayDirs(fs, log, table, Some(c)).foreach { case (anchor, dir) =>
        if (!retainedIds.contains(anchor))
          throw new IllegalStateException(
            s"checkpoint(keepLast=$keepLast) would fold away commit ${anchor.id}, " +
              s"which anchors the row-overlay sidecar $dir still serving retained " +
              "states; run OPTIMIZE (absorbs the overlay) or RowOverlay.squash to " +
              "re-anchor the rows first, or raise keepLast")
      }
    }
  }

  /** Merge-on-read DELETE: hide every current row matching `cond` (SQL
    * semantics — NULL predicates don't match) behind a fresh sidecar + an
    * empty-ops commit. Writes NO data files and moves NO version pointers.
    * The sidecar carries the full pair set for ONLY the files this delete
    * touched (prior pairs for those files folded in) — per-file
    * latest-wins resolution keeps untouched files' older groups live, so
    * the write is O(deletes in touched files), never O(all deletes ever).
    * Returns the number of newly deleted row positions; a no-match delete
    * commits nothing. The sidecar is written BEFORE the commit that
    * publishes it — a crash in between leaves an orphaned,
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
    // read-modify-write of the touched files' groups, so two racing
    // deletes reading the same previous groups would each fold in only
    // their own pairs — whichever landed second would silently UNDELETE
    // the first's rows in any shared file. commitIf against this pointer
    // resolves races to one winner and one loud, retryable refusal (the
    // engine's q57 posture).
    val expected = log.currentCommit(table.name)
    // match against the VISIBLE state (existing DVs applied) in LOGICAL
    // column names: predicates come from callers who see the mapped view
    // (SQL DELETE, feed consumers), and matching against the raw physical
    // frame would silently hit the WRONG column once renames stack (a
    // rename swap leaves the old physical name meaning a different
    // logical column). Unmapped columns — the (file, pos) pointers
    // included — pass through untouched.
    val visible = ColumnMapping.applyLogical(
      readWithPointers(spark, log, table, None), spark, log, table, None)
    if (visible.columns.isEmpty) return 0L
    // stale-name guard: the analyzer's missing-reference fallback would
    // resolve a predicate naming a PRE-RENAME physical column straight
    // through the mapping projection into the child scan — silently
    // matching a column that now means something else. Analyzing the
    // predicate against a LINEAGE-FREE empty frame carrying only the
    // logical view's columns has no child to fall through, so any stale
    // reference fails loudly here (metadata-only, no job runs).
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), visible.schema)
      .where(cond)
    val newPairs = visible
      .where(cond)
      .select(col(FileCol).as("file"), col(PosCol).as("pos"))
      .persist()
    try {
      val n = newPairs.count()
      if (n == 0L) return 0L
      val touched = newPairs.select(col("file")).distinct()
      val sidecar = resolvePairs(spark, log, table, None) match {
        case None => newPairs
        case Some(prev) =>
          prev
            .join(broadcast(touched), Seq("file"), "left_semi")
            .unionByName(newPairs)
            .distinct()
      }
      val id = CommitId(UUID.randomUUID().toString)
      val dir = deletesDir(table, id)
      // few AQE-sized sidecar files, not one per shuffle partition — every
      // subsequent read unions this dir (see writeSidecar)
      VersionContext.distributeForWrite(sidecar, Seq("file"))
        .write.mode("overwrite").parquet(dir)
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
