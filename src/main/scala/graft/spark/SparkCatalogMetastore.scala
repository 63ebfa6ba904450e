package graft.spark

import java.net.URI

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

import graft.core._
import graft.core.Metastore.{TableChanges, TableOperation}

/**
 * `Metastore` backed by the Spark session catalog (V6, V8–V12): the current
 * version of every table/partition is encoded in its catalog LOCATION and
 * recovered by parsing the trailing version label — the reference's
 * "locations are the database" design
 * (`spark/src/main/scala/com/gu/tableversions/spark/SparkHiveMetastore.scala:16-159`).
 *
 * With this metastore synced, `spark.table("schema.name")` reads exactly the
 * current-version directories through ordinary catalog resolution + partition
 * pruning (reference read path, SURVEY.md §3.2) — no custom reader needed.
 *
 * Table creation stays caller-side DDL, as in the reference
 * (`examples/.../TableLoader.scala:29-35`): this class only reads and
 * updates locations of existing tables.
 */
final class SparkCatalogMetastore(spark: SparkSession) extends Metastore {

  private def ident(t: TableName) = TableIdentifier(t.name, Some(t.schema))

  override def currentVersion(table: TableName): TableVersion = {
    val catalog = spark.sessionState.catalog
    val meta = catalog.getTableMetadata(ident(table)) // throws NoSuchTableException
    if (meta.partitionColumnNames.isEmpty)
      SnapshotTableVersion(VersionPaths.parseVersion(meta.location))
    else {
      val cols = meta.partitionColumnNames.toList
      val parts = catalog.listPartitions(ident(table))
      PartitionedTableVersion(parts.flatMap { cp =>
        val partition = Partition(cols.map(c => ColumnValue(PartitionColumn(c), cp.spec(c))))
        cp.storage.locationUri.map(loc => partition -> VersionPaths.parseVersion(loc))
      }.toMap)
    }
  }

  override def update(table: TableName, changes: TableChanges): Unit = {
    val fqn = s"${quoteIdent(table.schema)}.${quoteIdent(table.name)}"
    val baseLocation = tableBaseLocation(table)
    changes.operations.foreach {
      case TableOperation.AddPartition(p, v) =>
        spark.sql(
          s"ALTER TABLE $fqn ADD IF NOT EXISTS PARTITION (${partitionSpec(p)}) " +
            s"LOCATION '${SparkPaths.dirFor(baseLocation, p, v)}'")
      case TableOperation.UpdatePartitionVersion(p, v) =>
        spark.sql(
          s"ALTER TABLE $fqn PARTITION (${partitionSpec(p)}) " +
            s"SET LOCATION '${SparkPaths.dirFor(baseLocation, p, v)}'")
      case TableOperation.RemovePartition(p) =>
        spark.sql(s"ALTER TABLE $fqn DROP IF EXISTS PARTITION (${partitionSpec(p)})")
      case TableOperation.UpdateTableVersion(v) =>
        spark.sql(s"ALTER TABLE $fqn SET LOCATION '${VersionPaths.pathFor(baseLocation, v)}'")
    }
  }

  /** The unversioned table root: for snapshot tables the catalog location
    * itself carries the version label, so strip it back off. */
  private def tableBaseLocation(table: TableName): URI =
    VersionPaths.versionedToBasePath(
      spark.sessionState.catalog.getTableMetadata(ident(table)).location)

  /** Backtick-quoted identifier (covers reserved words and, for partition
    * columns — which aren't constrained like [[TableName]] — any char). */
  private def quoteIdent(ident: String): String =
    "`" + ident.replace("`", "``") + "`"

  /** Spark SQL string literal: single-quoted strings process BACKSLASH
    * escapes too, so a value ending in '\' would swallow the closing quote
    * if only quotes were doubled — escape both. */
  private def sqlLiteral(v: String): String =
    "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private def partitionSpec(p: Partition): String =
    p.columnValues
      .map(cv => s"${quoteIdent(cv.column.name)}=${sqlLiteral(cv.value)}")
      .mkString(", ")
}
