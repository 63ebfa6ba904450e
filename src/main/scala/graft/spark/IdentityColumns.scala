package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{lit, monotonically_increasing_id}

import graft.core._
import graft.core.Metastore.TableChanges
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/**
 * IDENTITY COLUMNS (the Delta `GENERATED ALWAYS AS IDENTITY` shape):
 * engine-assigned unique, batch-monotone row ids with NO coordination
 * between executors and no extra pass over the data.
 *
 * Assignment: ids are `hwm + 1 + monotonically_increasing_id()` — each
 * task stamps from its own disjoint 2³³-wide range, so uniqueness needs
 * no shuffle and no driver round-trip; like Delta, ids are unique and
 * increasing across batches but NOT contiguous (gaps are the price of
 * distributed assignment, and the documented contract).
 *
 * The HIGH-WATER MARK rides IN the write commit's message
 * (`identity:<col> hwm=<n>`, the MV-anchor/COPY-INTO discipline): the
 * advance and the data commit are one atomic record, so a crash cannot
 * fork the sequence, and the mark resolves from the commit the CURRENT
 * POINTER names (newest at-or-before — a RESTORE rolls the sequence back
 * with the data it rolled back; the fold's resurrect-on-next-commit quirk
 * then revives both together, keeping ids and rows consistent). The
 * recorded advance is the max id actually present in the staged output —
 * ground truth, immune to the write job planning a different partition
 * count than any pre-write observation.
 *
 * Scope (deliberate v1): assignment happens through
 * [[insertWithIdentity]] — the dedicated write entry — rather than being
 * hooked into every write path; a batch that already carries the column
 * is rejected (`ALWAYS` semantics: the engine owns the sequence).
 */
object IdentityColumns {

  private val Mark = """identity:(\w+) hwm=(\d+)""".r.unanchored

  /** The column's high-water mark as of the CURRENT pointer (0 = never
    * assigned). Newest at-or-before fold, like every per-state artifact. */
  def currentHighWaterMark(log: TableVersions, table: TableName, column: String): Long = {
    val cur = log.currentCommit(table)
    log.updates(table).iterator // newest first
      .dropWhile(_.id != cur)
      .map(_.message.content)
      .collectFirst { case Mark(c, n) if c.equalsIgnoreCase(column) => n.toLong }
      .getOrElse(0L)
  }

  /** Write `df` as a new version of `table` with engine-assigned ids in
    * `column`. One ordinary versioned write; the id column and the
    * advanced high-water mark ride the same atomic commit. */
  def insertWithIdentity(
      df: DataFrame,
      ctx: VersionContext,
      table: TableDefinition,
      column: String,
      userId: UserId,
      message: UpdateMessage): (TableVersion, TableChanges) = {
    require(!df.columns.exists(_.equalsIgnoreCase(column)),
      s"identity column $column is GENERATED ALWAYS — the batch must not supply it")
    val log = ctx.metastore.tableVersions
    val hwm = currentHighWaterMark(log, table.name, column)
    // stage first, commit second: the advance recorded in the commit is the
    // MAX ID ACTUALLY ASSIGNED, read back from the staged output — never a
    // prediction from an observed partition count (AQE can re-plan the
    // write with more partitions than a separate df.rdd conversion showed,
    // which would assign ids above a predicted headroom and let the next
    // batch collide). One batch-sized single-column scan of the files just
    // written; parquet column stats keep it footer-cheap.
    val staged = df.withColumn(column, lit(hwm + 1L) + monotonically_increasing_id())
      .versionedStage(ctx, table, userId, message)
    val spark = df.sparkSession
    val dirs = staged.update.operations.collect {
      case TableVersions.TableOperation.AddTableVersion(v) =>
        VersionPaths.pathFor(table.location, v).toString
      case TableVersions.TableOperation.AddPartitionVersion(p, v) =>
        SparkPaths.dirFor(table.location, p, v)
    }
    val assignedMax: Option[Long] =
      if (dirs.isEmpty) None
      else {
        val raw = spark.read.format(table.format.name).load(dirs: _*)
        // staged files carry PHYSICAL names under column mapping
        val logical = ColumnMapping.applyLogical(raw, spark, log, table, None)
        val r = logical.agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col(column))).head()
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      }
    val newHwm = assignedMax.getOrElse(hwm)
    val update = staged.update.copy(metadata = staged.update.metadata.copy(
      message = UpdateMessage(s"${message.content} identity:$column hwm=$newHwm")))
    ctx.metastore.commit(table.name, update)
  }
}
