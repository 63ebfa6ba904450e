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

  /** Partition rebuilt with the CATALOG's column-name casing — used for the
    * PARTITION (…) spec only: the session catalog lower-cases column names,
    * so a log-side partition written with `eventDate` must address the
    * catalog's `eventdate` row — otherwise a sync emits a no-op ADD IF NOT
    * EXISTS followed by a DROP that removes the live partition. LOCATION
    * paths keep the ORIGINAL casing: that is what `partitionBy` wrote to
    * disk. */
  private def specCased(catalogCols: Seq[String], p: Partition): Partition =
    Partition(p.columnValues.map { cv =>
      val canonical = catalogCols
        .find(_.equalsIgnoreCase(cv.column.name))
        .getOrElse(cv.column.name)
      ColumnValue(PartitionColumn(canonical), cv.value)
    })

  override def update(table: TableName, changes: TableChanges): Unit = {
    val fqn = s"${quoteIdent(table.schema)}.${quoteIdent(table.name)}"
    val baseLocation = tableBaseLocation(table)
    val catalogCols = spark.sessionState.catalog
      .getTableMetadata(ident(table)).partitionColumnNames
    def spec(p: Partition) = partitionSpec(specCased(catalogCols, p))
    // one DDL round trip per partition for adds/drops is O(#partitions)
    // sequential metastore RPCs — batch them into single statements.
    // Safe to reorder into adds → drops → updates: computeChanges
    // classifies each partition into exactly one bucket.
    val ops = changes.operations
    val adds = ops.collect { case TableOperation.AddPartition(p, v) => (p, v) }
    if (adds.nonEmpty)
      spark.sql(
        s"ALTER TABLE $fqn ADD IF NOT EXISTS " + adds.map { case (p, v) =>
          s"PARTITION (${spec(p)}) LOCATION '${SparkPaths.dirFor(baseLocation, p, v)}'"
        }.mkString(" "))
    val drops = ops.collect { case TableOperation.RemovePartition(p) => p }
    if (drops.nonEmpty)
      spark.sql(
        s"ALTER TABLE $fqn DROP IF EXISTS " +
          drops.map(p => s"PARTITION (${spec(p)})").mkString(", "))
    ops.foreach {
      case TableOperation.UpdatePartitionVersion(p, v) =>
        spark.sql(
          s"ALTER TABLE $fqn PARTITION (${spec(p)}) " +
            s"SET LOCATION '${SparkPaths.dirFor(baseLocation, p, v)}'")
      case TableOperation.UpdateTableVersion(v) =>
        spark.sql(s"ALTER TABLE $fqn SET LOCATION '${VersionPaths.pathFor(baseLocation, v)}'")
      case _ => () // adds/drops handled batched above
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

  /** Spark SQL string literal. Two parser modes exist: by default
    * single-quoted strings process backslash escapes (a value ending in
    * `\` would swallow the closing quote), but under
    * `spark.sql.parser.escapedStringLiterals=true` (Hive compatibility)
    * backslashes are literal and `\'` would NOT close-quote-escape. Quote
    * doubling works in both modes; backslash doubling only in the
    * default — so consult the session conf. */
  private def sqlLiteral(v: String): String = {
    val escapedMode = spark.conf
      .getOption("spark.sql.parser.escapedStringLiterals").contains("true")
    val body =
      if (escapedMode) v.replace("'", "''")
      else v.replace("\\", "\\\\").replace("'", "\\'")
    "'" + body + "'"
  }

  private def partitionSpec(p: Partition): String =
    p.columnValues
      .map(cv => s"${quoteIdent(cv.column.name)}=${sqlLiteral(cv.value)}")
      .mkString(", ")
}
