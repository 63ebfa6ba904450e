package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/**
 * MERGE (upsert) onto a versioned table — the `MERGE INTO t USING s ON
 * t.k = s.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
 * of Delta/Iceberg, expressed as copy-on-write over the versioned layout
 * (the reference has per-partition version commits but no row-level DML;
 * this composes its write primitive — `spark/.../VersionContext.scala:53-90`
 * overwrite-partitions-present — into the table-format operation users
 * reach for first).
 *
 * Copy-on-write granularity: for a partitioned table, ONLY the partitions
 * present in the source are read and rewritten; every other partition's
 * version pointer is untouched, so a merge that updates one partition of a
 * 100 TB table reads and writes one partition, not the table. Snapshot
 * tables rewrite the whole snapshot (their commit granularity is the table).
 *
 * The result is an ordinary commit: time travel shows the pre-merge state,
 * checkout rolls it back, and readers flip atomically at the commit.
 *
 * Plan shape: one shuffle equi-join (anti) on the merge key between the
 * touched-partition scan and the source, then the standard versioned write.
 * Nothing row-sized reaches the driver; the only collect is the source's
 * distinct partition values (#partitions rows, same bound as the write
 * path's own discovery).
 */
object Merge {

  /** Apply `source` to `table` by `keyCols`: matched current rows are
    * replaced by their source row, unmatched source rows are inserted,
    * unmatched current rows are kept. The source must be unique per key —
    * duplicate source keys would both survive (pre-aggregate if unsure).
    * The source must carry exactly the table's columns (including the
    * partition columns for a partitioned table). */
  def mergeInto(
      ctx: VersionContext,
      log: TableVersions,
      table: TableDefinition,
      source: DataFrame,
      keyCols: Seq[String],
      userId: UserId,
      message: UpdateMessage): Unit = {
    require(keyCols.nonEmpty, "merge requires at least one key column")
    require(
      keyCols.forall(source.columns.contains),
      s"merge key columns ${keyCols.mkString(", ")} must all exist in the source")
    val spark = source.sparkSession
    // persist across touched-partition discovery and the final write: a
    // non-deterministic source re-evaluated between the two could touch
    // partitions the discovery never saw (same guard as SQL INSERT INTO)
    val src = source.persist()
    try {
      val reader = VersionedReader(spark, log)
      val current =
        if (table.isSnapshot) reader.read(table)
        else reader.readPartitions(
          table, VersionContext.partitionValues(src, table.partitionSchema))
      // a source missing one of the table's columns would silently REWRITE
      // the touched partitions without it (kept rows are projected to the
      // source's columns) — refuse instead; additive evolution goes the
      // other way (extra source columns), via readMergedSchema on the read
      if (current.columns.nonEmpty) {
        val missing = current.columns.filterNot(c =>
          source.columns.exists(_.equalsIgnoreCase(c)))
        require(missing.isEmpty,
          s"merge source must carry every current table column; missing: ${missing.mkString(", ")}")
      }
      val cols = src.columns.map(col)
      // WHEN MATCHED UPDATE SET * ≡ drop the matched current rows and take
      // the source row instead; the anti-join tolerates duplicate source
      // keys without inflating, so no distinct pass is needed on the keys
      val kept =
        if (current.columns.isEmpty) src.limit(0) // never-written table
        else current.join(src.select(keyCols.map(col): _*), keyCols, "left_anti")
      kept.select(cols: _*)
        .unionByName(src)
        .versionedInsertInto(ctx, table, userId, message)
      ()
    } finally { src.unpersist(); () }
  }
}
