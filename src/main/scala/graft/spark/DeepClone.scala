package graft.spark

import java.net.URI
import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.core.TableVersions.{CommitId, TableUpdate, UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/**
 * DEEP CLONE — an independent physical copy of a table state (the Delta
 * `CREATE TABLE dst DEEP CLONE src` semantics): the clone gets its OWN
 * location holding a fresh materialization of the cloned state's RESOLVED
 * rows, plus the source's table-level declarations. Unlike
 * [[ShallowClone]], nothing is shared afterwards — no linkage tags, no
 * vacuum coupling, either side vacuums/compacts/evolves freely. The price
 * is one distributed read+write of the cloned state (a shallow clone is
 * O(#partitions) metadata); the payoff over plain CTAS is the carried
 * metadata a SELECT cannot express.
 *
 * "Resolved" means what a SELECT sees at the cloned commit: deletion
 * vectors applied, merge-on-read overlay rows unioned in, column-mapping
 * renames/drops and type widening resolved to the logical schema. The
 * clone therefore starts with ZERO sidecar debt — deep-cloning a
 * DV/overlay-heavy table is also its compaction.
 *
 * Carried declarations (seeded into the clone's own metadata, owned
 * independently from then on): CHECK constraints, generated-column rules,
 * column DEFAULTs, the identity declaration WITH the source's high-water
 * mark at the cloned state (clone writes never re-mint carried ids), and
 * the COPY INTO load history (the clone never re-ingests files whose rows
 * it already holds). Deletion vectors, overlays, and the column mapping
 * do NOT carry — their effects are materialized into the copied rows.
 *
 * A mixed-era source (metadata-only partition evolution) materializes
 * entirely under the CURRENT scheme of the cloned state: the copy job
 * re-buckets old-era rows, so the clone has exactly one era.
 */
object DeepClone {

  /** Copy `src`'s state at `asOf` (default: current) into the new table
    * `dst` at `dstLocation`. Returns the clone's definition. */
  def clone(
      spark: SparkSession,
      ctx: VersionContext,
      src: TableDefinition,
      dst: TableName,
      dstLocation: URI,
      user: UserId,
      asOf: Option[CommitId] = None): TableDefinition = {
    val log = ctx.metastore.tableVersions
    require(dst != src.name, "a table cannot deep-clone itself")
    require(Partition.normalizedDir(dstLocation) != Partition.normalizedDir(src.location),
      "DEEP CLONE needs its own location — to fork in place use SHALLOW CLONE")
    val at = asOf.getOrElse(log.currentCommit(src.name))

    // the clone materializes under the era-correct scheme of the cloned
    // state (same resolution as ShallowClone — a caller's definition may
    // predate an evolution)
    val dstDefn = TableDefinition(
      dst, dstLocation,
      PartitionEvolution.schemeAt(spark, log, src, Some(at)), src.format)
    ctx.init(dstDefn, user, UpdateMessage(
      s"DEEP CLONE of ${src.name.fullyQualifiedName} @ ${at.id}"))

    // one distributed write of the resolved rows (DV-applied, overlay-
    // unioned, logically named). Declarations seed AFTER the write: a
    // pre-seeded identity column would reject the batch (GENERATED ALWAYS
    // refuses supplied ids) and a generated-column rule would re-derive
    // values the rows already carry.
    val rows = DeletionVectors.read(spark, log, src, Some(at))
    if (rows.columns.nonEmpty && !rows.isEmpty) {
      rows.versionedInsertInto(ctx, dstDefn, user, UpdateMessage(
        s"deep clone state of ${src.name.fullyQualifiedName} @ ${at.id}"))
    }

    val constraints = Constraints.list(spark, src)
    if (constraints.nonEmpty) Constraints.seed(spark, dstDefn, constraints)
    val generated = GeneratedColumns.list(spark, src)
    if (generated.nonEmpty) GeneratedColumns.seed(spark, dstDefn, generated)
    val defaults = ColumnDefaults.list(spark, src)
    if (defaults.nonEmpty) ColumnDefaults.seed(spark, dstDefn, defaults)
    TableProperties.seed(spark, dstDefn, TableProperties.list(spark, src))
    // identity: declaration plus the source's high-water mark AT the
    // cloned state, riding a metadata commit exactly like ShallowClone —
    // a clone write stamping from 0 would collide with carried ids
    IdentityColumns.declared(spark, src).foreach { c =>
      IdentityColumns.seedDeclaration(spark, dstDefn, c)
      val mark = IdentityColumns.markText(
        c, IdentityColumns.effectiveHighWaterMarkAt(spark, log, src, c, Some(at)))
      ctx.metastore.commit(dst, TableUpdate(
        user,
        UpdateMessage(s"deep clone identity carry of " +
          s"${src.name.fullyQualifiedName} @ ${at.id} $mark"),
        Instant.now(), Nil))
      ()
    }
    // COPY INTO load history: the copied rows contain the source's
    // ingested data, so the loaded-file set must carry or a COPY INTO on
    // the clone from the same landing dir would duplicate rows
    val loaded = CopyInto.loadedFiles(log, src.name)
    if (loaded.nonEmpty) {
      ctx.metastore.commit(dst, TableUpdate(
        user,
        UpdateMessage(s"COPY INTO ${dst.fullyQualifiedName} from deep-clone-carry of " +
          s"${src.name.fullyQualifiedName} files=[${loaded.toList.sorted.mkString(";")}]"),
        Instant.now(), Nil))
      ()
    }
    dstDefn
  }
}
