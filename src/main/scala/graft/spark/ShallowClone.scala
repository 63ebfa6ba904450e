package graft.spark

import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.core.TableVersions.{CommitId, TableOperation, TableUpdate, UpdateMessage, UserId}

/**
 * SHALLOW CLONE — zero-copy table fork (the Delta `CREATE TABLE ... SHALLOW
 * CLONE src [VERSION AS OF v]` semantics, re-expressed on the version-dir
 * model): the clone is a NEW table in the commit log whose first commit
 * references the SOURCE's version directories. Not a byte of data moves —
 * cloning a 100 TB table is O(#partitions) metadata. Because version dirs
 * are immutable and writers only ever create fresh labels, the fork is
 * free of interference by construction:
 *
 *  - writes to the clone mint NEW version dirs (under the shared physical
 *    location) that the source's log never references — the source is
 *    unaffected;
 *  - writes to the source move the SOURCE's pointers — the clone keeps
 *    serving the dirs its own log references.
 *
 * Linkage is recorded as TAGS on both sides (`clone:<dst>` on the source
 * at the cloned commit, `cloned-from:<src>` on the clone), which
 * [[Vacuum]] already treats as retention pins — the cloned state's dirs
 * cannot be reclaimed out from under the clone by a source vacuum. Beyond
 * pinning, [[Vacuum.vacuum]] REFUSES outright on either side of a live
 * clone link: the two logs share one physical namespace, and a vacuum
 * driven by only one log would reclaim dirs only the other references
 * (e.g. the clone's post-fork writes look unreferenced to the source).
 * Dropping the link (`deleteRef`) re-enables vacuum.
 *
 * Refused (loudly) when the cloned state depends on commit-anchored or
 * location-global metadata the clone's fresh history cannot resolve:
 *  - live deletion vectors (the clone's lineage holds none of the
 *    source's sidecar anchors — cloned reads would resurrect deleted
 *    rows); OPTIMIZE the source first to absorb them;
 *  - an active column mapping (same anchor problem: the clone would
 *    silently revert renames/drops);
 *  - table constraints (`_constraints.json` is location-global state —
 *    the clone would share and mutate the source's enforcement).
 */
object ShallowClone {

  /** Tag prefixes recording a clone link (both are TAGS — immutable). */
  val CloneTagPrefix = "clone:"
  val ClonedFromTagPrefix = "cloned-from:"

  /** True if this table is either side of a live clone link. */
  def hasCloneLink(log: TableVersions, table: TableName): Boolean =
    log.refs(table).keys.exists(n =>
      n.startsWith(CloneTagPrefix) || n.startsWith(ClonedFromTagPrefix))

  /** Fork `src` as the new table `dst` at commit `asOf` (default: the
    * source's current state). Returns the clone's table definition —
    * same location, format, and partition schema as the source; its own
    * independent history. */
  def clone(
      spark: SparkSession,
      ctx: VersionContext,
      src: TableDefinition,
      dst: TableName,
      user: UserId,
      asOf: Option[CommitId] = None): TableDefinition = {
    val log = ctx.metastore.tableVersions
    val at = asOf.getOrElse(log.currentCommit(src.name))
    require(dst != src.name, "a table cannot clone itself")

    if (DeletionVectors.hasVectors(spark, log, src, Some(at)))
      throw new IllegalArgumentException(
        s"cannot shallow-clone ${src.name.fullyQualifiedName} at ${at.id}: the state " +
          "carries live deletion vectors, which are anchored to the source's commit " +
          "history and unresolvable from the clone's — run OPTIMIZE (full rewrite) " +
          "on the source to absorb them first")
    if (ColumnMapping.stateAt(spark, log, src, Some(at)).isDefined)
      throw new IllegalArgumentException(
        s"cannot shallow-clone ${src.name.fullyQualifiedName}: an active column " +
          "mapping is anchored to the source's commit history; the clone would " +
          "silently revert renames/drops")
    if (Constraints.list(spark, src).nonEmpty)
      throw new IllegalArgumentException(
        s"cannot shallow-clone ${src.name.fullyQualifiedName}: table constraints are " +
          "location-global metadata the clone would share and mutate; drop them first")

    val state = log.versionAt(src.name, at)
    val dstDefn = TableDefinition(dst, src.location, src.partitionSchema, src.format)
    ctx.init(dstDefn, user, UpdateMessage(
      s"SHALLOW CLONE of ${src.name.fullyQualifiedName} @ ${at.id}"))
    val ops: List[TableOperation] = state match {
      case SnapshotTableVersion(v) =>
        if (v == Version.Unversioned) Nil else List(TableOperation.AddTableVersion(v))
      case PartitionedTableVersion(pvs) =>
        pvs.toList.map { case (p, v) => TableOperation.AddPartitionVersion(p, v) }
    }
    if (ops.nonEmpty) {
      ctx.metastore.commit(dst, TableUpdate(
        user, UpdateMessage(s"clone state of ${src.name.fullyQualifiedName} @ ${at.id}"),
        Instant.now(), ops))
      ()
    }
    // linkage tags: pin the cloned state against source vacuum, mark both
    // sides so vacuum refuses while the link lives
    log.setRef(src.name, CloneTagPrefix + dst.fullyQualifiedName, at, isTag = true)
    log.setRef(dst, ClonedFromTagPrefix + src.name.fullyQualifiedName,
      log.currentCommit(dst), isTag = true)
    dstDefn
  }

  /** Sever a clone link: drop the `clone:<dst>` tag on the source and the
    * `cloned-from:<src>` tag on the clone (whichever exist), re-enabling
    * vacuum on both sides. The clone TABLE keeps working — only the
    * vacuum-safety linkage is dropped, so the caller takes on the Delta
    * caveat: a source vacuum may now reclaim dirs the clone references. */
  def unlink(log: TableVersions, src: TableName, dst: TableName): Unit = {
    val srcTag = CloneTagPrefix + dst.fullyQualifiedName
    val dstTag = ClonedFromTagPrefix + src.fullyQualifiedName
    if (log.refs(src).contains(srcTag)) log.deleteRef(src, srcTag)
    if (log.refs(dst).contains(dstTag)) log.deleteRef(dst, dstTag)
  }
}
