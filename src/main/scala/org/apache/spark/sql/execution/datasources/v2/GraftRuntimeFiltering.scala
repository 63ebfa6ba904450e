package org.apache.spark.sql.execution.datasources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And => CAnd, AttributeReference, EqualTo => CEqualTo, Expression, GenericInternalRow,
  In => CIn, Literal}
import org.apache.spark.sql.connector.expressions.{Expressions, FieldReference, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{
  Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, ScanBuilder,
  Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns,
  SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{
  KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.internal.connector.{SupportsMetadata, SupportsPushDownCatalystFilters}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

/**
 * DYNAMIC PARTITION PRUNING for graft's DSv2 file-table delegates.
 *
 * Spark's V2 `FileScan` implements no runtime-filtering interface (one of
 * the reasons stock Spark keeps parquet on the V1 path by default), so a
 * star join against a versioned catalog table would statically scan every
 * partition the commit log references even when the dim side's filter
 * admits two of them. This wrapper closes that gap:
 *
 *  - [[GraftDppScanBuilder]] forwards the full pushdown surface
 *    (catalyst filters — the static partition-pruning channel — required
 *    columns, aggregates) to the real file-scan builder, then wraps the
 *    built scan;
 *  - [[GraftDppFileScan]] declares the table's PARTITION COLUMNS as
 *    `filterAttributes`, which makes the stock `PartitionPruning` rule
 *    plant its DPP subquery on joins keyed by them; at execution the
 *    subquery's values arrive as `sources.In`/`EqualTo` filters and the
 *    scan re-plans with them appended to the delegate's partition
 *    filters — the standard `PartitioningAwareFileIndex` pruning path,
 *    so only the surviving partitions' files are listed and read.
 *
 * Unconvertible runtime predicates are ignored (pruning is an
 * optimization; correctness comes from the join itself). The wrapper is
 * a case class over the delegate so exchange/scan reuse keeps working.
 */
final class GraftDppScanBuilder(
    delegate: ScanBuilder,
    streamInfo: Option[graft.spark.VersionedStream.GraftStreamInfo] = None)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates {

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = delegate match {
    case d: SupportsPushDownCatalystFilters => d.pushFilters(filters)
    case _                                  => filters
  }

  override def pushedFilters: Array[Predicate] = delegate match {
    case d: SupportsPushDownCatalystFilters => d.pushedFilters
    case _                                  => Array.empty
  }

  override def pruneColumns(requiredSchema: StructType): Unit = delegate match {
    case d: SupportsPushDownRequiredColumns => d.pruneColumns(requiredSchema)
    case _                                  => ()
  }

  override def pushAggregation(aggregation: Aggregation): Boolean = delegate match {
    case d: SupportsPushDownAggregates => d.pushAggregation(aggregation)
    case _                             => false
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean = delegate match {
    case d: SupportsPushDownAggregates => d.supportCompletePushDown(aggregation)
    case _                             => false
  }

  override def build(): Scan = delegate.build() match {
    case fs: FileScan if fs.fileIndex.partitionSchema.nonEmpty =>
      // STORAGE-PARTITIONED JOINS are opt-in via a GRAFT switch (the stock
      // v2-bucketing conf defaults to TRUE on Spark 4 and gates the
      // planner side, so it cannot double as the opt-in): a keyed scan
      // plans ONE input partition per table partition, trading file-split
      // parallelism for exchange-free co-partitioned joins — flip it when
      // the join matters more than the scan. Runtime filtering (DPP) stays
      // the default posture.
      val spjOptIn = SQLConf.get
        .getConfString("spark.graft.storagePartitionedJoin.enabled", "false")
        .toBoolean
      if (spjOptIn && SQLConf.get.v2BucketingEnabled) GraftKeyedFileScan(fs, streamInfo)
      else GraftDppFileScan(fs, streamInfo)
    case other => other
  }
}

/**
 * STORAGE-PARTITIONED JOIN scan (Iceberg's SPJ pattern on graft tables):
 * reports `KeyGroupedPartitioning` over the table's partition columns and
 * plans one `HasPartitionKey` input partition per PARTITION VALUE, so a
 * join of two tables partitioned the same way — keyed on the partition
 * columns — needs NO exchange on either side: at 100 TB that is the
 * difference between shuffling two tables and streaming co-located
 * partition pairs. Active only under
 * `spark.sql.sources.v2.bucketing.enabled` (see [[GraftDppScanBuilder]]);
 * runtime filtering is intentionally NOT combined with the keyed batch
 * (re-planning after the partition count was reported would break the
 * contract), and DPP loses nothing: the join that would prune is the one
 * being co-located.
 */
final case class GraftKeyedFileScan(
    delegate: FileScan,
    streamInfo: Option[graft.spark.VersionedStream.GraftStreamInfo] = None)
  extends Scan with SupportsReportPartitioning with SupportsReportStatistics
  with SupportsMetadata {

  // readStream.table("cat.db.t") — the catalog-named NET-CONTENTS stream
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    streamInfo.map(graft.spark.VersionedStream.microBatchStream(_, checkpointLocation))
      .getOrElse(throw new UnsupportedOperationException(
        s"table ${delegate.fileIndex} does not support streaming reads from this load"))

  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = delegate.description()
  override def getMetaData(): Map[String, String] = delegate.getMetaData()
  override def estimateStatistics(): Statistics = delegate.estimateStatistics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    delegate.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    delegate.reportDriverMetrics()

  private def partSchema: StructType = delegate.fileIndex.partitionSchema

  /** One file-partition per PARTITION VALUE: regroup the delegate's
    * bin-packed splits by each file's partition values (all files of a
    * value land in one input partition — the grouping the partitioning
    * report promises). */
  @transient private lazy val keyedPartitions: Array[InputPartition] = {
    val files = delegate.toBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => sys.error(s"unexpected non-file input partition: $other")
    }
    val types = partSchema.map(_.dataType)
    files
      .groupBy(f => f.partitionValues.toSeq(partSchema))
      .toSeq
      .sortBy(_._1.mkString("\u0000")) // deterministic order across sides
      .zipWithIndex
      .map { case ((key, fs), i) =>
        GraftKeyedFilePartition(
          FilePartition(i, fs),
          new GenericInternalRow(key.toArray)): InputPartition
      }
      .toArray
  }

  override def outputPartitioning(): Partitioning =
    if (keyedPartitions.isEmpty) new UnknownPartitioning(0)
    else new KeyGroupedPartitioning(
      partSchema.fieldNames.map(Expressions.identity(_)).toArray[
        org.apache.spark.sql.connector.expressions.Expression],
      keyedPartitions.length)

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = keyedPartitions
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftUnwrapReaderFactory(delegate.toBatch.createReaderFactory())
  }
}

/** A file partition carrying its partition-value key (the `HasPartitionKey`
  * contract the key-grouped report requires). */
final case class GraftKeyedFilePartition(fp: FilePartition, key: InternalRow)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = fp.preferredLocations()
}

/** Unwraps [[GraftKeyedFilePartition]] before delegating to the stock
  * file reader factory (which pattern-matches on `FilePartition`). */
final class GraftUnwrapReaderFactory(delegate: PartitionReaderFactory)
  extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case k: GraftKeyedFilePartition => k.fp
    case other                      => other
  }
  override def createReader(p: InputPartition) = delegate.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition) = delegate.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(unwrap(p))
}

final case class GraftDppFileScan(
    delegate: FileScan,
    streamInfo: Option[graft.spark.VersionedStream.GraftStreamInfo] = None)
  extends Scan with SupportsRuntimeFiltering with SupportsReportStatistics
  with SupportsMetadata {

  // readStream.table("cat.db.t") — the catalog-named NET-CONTENTS stream
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    streamInfo.map(graft.spark.VersionedStream.microBatchStream(_, checkpointLocation))
      .getOrElse(throw new UnsupportedOperationException(
        "this graft scan does not support streaming reads (time-travel " +
          "loads and mixed-era states stream via the VersionedStream API)"))

  // the delegate re-planned with the runtime partition filters appended;
  // deliberately NOT part of the case-class equality (reuse compares the
  // logical scan, and runtime filters arrive after planning)
  @transient private var pruned: FileScan = delegate

  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = delegate.description()
  override def getMetaData(): Map[String, String] = delegate.getMetaData()
  override def estimateStatistics(): Statistics = pruned.estimateStatistics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    delegate.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    pruned.reportDriverMetrics()
  override def toBatch: Batch = pruned // FileScan is its own Batch

  override def filterAttributes(): Array[NamedReference] = {
    // only partition columns the scan actually OUTPUTS: the planner
    // resolves these against the pruned relation output and throws on a
    // projected-away column. A join keyed on the partition column always
    // projects it, so DPP still fires exactly where it applies.
    val out = delegate.readSchema().fieldNames.map(_.toLowerCase).toSet
    delegate.fileIndex.partitionSchema.fieldNames
      .filter(f => out.contains(f.toLowerCase)).map(FieldReference(_))
  }

  override def filter(filters: Array[sources.Filter]): Unit = {
    val ps = delegate.fileIndex.partitionSchema
    val exprs = filters.toSeq.flatMap(toCatalyst(ps, _))
    if (exprs.nonEmpty)
      pruned = withPartitionFilters(delegate, delegate.partitionFilters ++ exprs)
  }

  private def attr(ps: StructType, name: String): Option[AttributeReference] =
    ps.find(_.name.equalsIgnoreCase(name))
      .map(f => AttributeReference(f.name, f.dataType, f.nullable)())

  /** DPP hands `In`/`EqualTo` (subquery values) — convert those; anything
    * else skips pruning rather than risking a wrong predicate. */
  private def toCatalyst(ps: StructType, f: sources.Filter): Option[Expression] = f match {
    case sources.In(a, vs) =>
      attr(ps, a).map(ar => CIn(ar, vs.toSeq.map(v => Literal.create(v, ar.dataType))))
    case sources.EqualTo(a, v) =>
      attr(ps, a).map(ar => CEqualTo(ar, Literal.create(v, ar.dataType)))
    case sources.And(l, r) =>
      for { a <- toCatalyst(ps, l); b <- toCatalyst(ps, r) } yield CAnd(a, b)
    case _ => None
  }

  private def withPartitionFilters(fs: FileScan, pf: Seq[Expression]): FileScan = fs match {
    case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
      p.copy(partitionFilters = pf)
    case o: org.apache.spark.sql.execution.datasources.v2.orc.OrcScan =>
      o.copy(partitionFilters = pf)
    case other => other // unknown format: serve unpruned (still correct)
  }
}
