package graft.spark

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.v2.orc.OrcTable
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core._
import graft.core.TableVersions.CommitId

/**
 * DataSource V2 `TableCatalog` over the versioning layer (SURVEY.md §4.3
 * "proper integration"): versioned tables become first-class SQL citizens —
 *
 * {{{
 *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftTableCatalog].getName)
 *   GraftTableCatalog.bind("graft", log)
 *   GraftTableCatalog.register("graft", tableDefinition)
 *
 *   spark.sql("SELECT * FROM graft.db.events")                       // current version
 *   spark.sql("SELECT * FROM graft.db.events VERSION AS OF '<id>'")  // time travel
 * }}}
 *
 * `loadTable` resolves the commit log to concrete version directories and
 * returns Spark's own V2 parquet/ORC file table over them, so scans get the
 * stock pushdown/pruning/vectorization path; the `VERSION AS OF` overload
 * resolves the log AT that commit — the SQL-native spelling of
 * [[VersionedReader.readAsOf]] (reference read model:
 * `spark/src/main/scala/com/gu/tableversions/spark/SparkHiveMetastore.scala:16-43`,
 * which can only ever expose the latest synced version).
 *
 * Writes stay on the versioned write path (`versionedInsertInto`), exactly
 * like the reference: the catalog is read-only and `createTable` & co.
 * reject, since table creation is caller-side DDL
 * (`examples/.../TableLoader.scala:29-35`).
 */
final class GraftTableCatalog extends TableCatalog {
  import GraftTableCatalog._

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    // allow a pure-conf setup: spark.sql.catalog.<name>.logDir=<dir> binds
    // the durable JSON log without any programmatic bind() call
    Option(options.get("logDir")).foreach { dir =>
      bindings.putIfAbsent(name, Binding(JsonFileTableVersions(dir), TrieMap.empty))
    }
  }

  override def name(): String = catalogName

  private def binding: Binding =
    bindings.getOrElse(catalogName,
      throw new IllegalStateException(
        s"GraftTableCatalog '$catalogName' is not bound: call GraftTableCatalog.bind " +
          "or set spark.sql.catalog.$name.logDir"))

  private def tableNameOf(ident: Identifier): TableName = {
    require(ident.namespace.length == 1,
      s"graft tables are schema.name; got ${ident.toString}")
    TableName(ident.namespace.head, ident.name)
  }

  private def definitionOf(ident: Identifier): TableDefinition =
    binding.tables.getOrElse(tableNameOf(ident).fullyQualifiedName,
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] =
    binding.tables.keys.toArray.sorted.flatMap { fqn =>
      TableName.fromFullyQualified(fqn).toOption.collect {
        case t if namespace.isEmpty || namespace.sameElements(Array(t.schema)) =>
          Identifier.of(Array(t.schema), t.name)
      }
    }

  override def tableExists(ident: Identifier): Boolean =
    binding.tables.contains(tableNameOf(ident).fullyQualifiedName)

  override def loadTable(ident: Identifier): Table = {
    val defn = definitionOf(ident)
    fileTable(defn, binding.log.currentVersion(defn.name))
  }

  /** `VERSION AS OF '<commitId>'` — time travel through the commit log. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val defn = definitionOf(ident)
    fileTable(defn, binding.log.versionAt(defn.name, CommitId(version)))
  }

  private def fileTable(defn: TableDefinition, tv: TableVersion): Table = {
    val spark = SparkSession.active
    val (paths, opts) = tv match {
      case SnapshotTableVersion(v) =>
        (Seq(VersionPaths.pathFor(defn.location, v).toString), Map.empty[String, String])
      case PartitionedTableVersion(pvs) =>
        // leaf version dirs + basePath so `k=v` segments become partition
        // columns (same layout contract as VersionedReader.doMaterialize)
        (pvs.toSeq.map { case (p, v) => SparkPaths.dirFor(defn.location, p, v) }.sorted,
          Map("basePath" -> defn.location.toString))
    }
    val options = new CaseInsensitiveStringMap(opts.asJava)
    defn.format match {
      case FileFormat.Orc =>
        OrcTable(defn.name.fullyQualifiedName, spark, options, paths, None,
          classOf[org.apache.spark.sql.execution.datasources.orc.OrcFileFormat])
      case _ =>
        ParquetTable(defn.name.fullyQualifiedName, spark, options, paths, None,
          classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
    }
  }

  // -- writes go through versionedInsertInto, never through catalog DDL --

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft tables are created caller-side and written via versionedInsertInto")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}

object GraftTableCatalog {

  private[spark] final case class Binding(
      log: TableVersions, tables: TrieMap[String, TableDefinition])

  private val bindings = TrieMap[String, Binding]()

  /** Bind a commit log to a catalog name (programmatic alternative to the
    * `spark.sql.catalog.<name>.logDir` conf). */
  def bind(catalogName: String, log: TableVersions): Unit =
    bindings.put(catalogName, Binding(log, TrieMap.empty))

  /** Expose a versioned table through catalog `catalogName`. */
  def register(catalogName: String, table: TableDefinition): Unit =
    bindings.getOrElse(catalogName,
      throw new IllegalStateException(s"catalog '$catalogName' is not bound"))
      .tables.put(table.name.fullyQualifiedName, table)
}
