package graft.core

import java.net.URI

/**
 * Core domain model for the versioning layer.
 *
 * Semantics follow the reference implementation's data model
 * (guardian/table-versions, `core/src/main/scala/com/gu/tableversions/core/model.scala:10-109`):
 * a table is either a snapshot table (whole-table replacement per write) or a
 * partitioned table (per-partition replacement); partition values are plain
 * strings rendered in Hive path form `col=value[/col2=value2...]`.
 *
 * Differences from the reference: no cats `NonEmptyList` (offline build) —
 * invariants are enforced with `require`; everything is plain synchronous
 * Scala.
 */

/** A named partition column. Names only — partition column types come from
 * the data schema (reference `model.scala:41`). */
final case class PartitionColumn(name: String) {
  require(name.nonEmpty, "partition column name must be non-empty")
  require(!name.contains("/") && !name.contains("="),
    s"partition column name must not contain '/' or '=': '$name'")
}

/** A concrete value of a partition column. Values are strings; canonical
 * formatting is the writer's responsibility (reference `model.scala:43`).
 *
 * Values must round-trip through [[Partition.hivePath]]/[[Partition.parse]]
 * — the rendering the durable commit log persists. A '/' would either fail
 * replay (bricking the table's log) or, worse, re-parse as EXTRA partition
 * columns (`"x/y=z"` → two columns), silently changing partition identity;
 * an empty value renders a `k=` segment parse rejects. Enforced here so a
 * bad value fails the WRITE, not every later read. (Values may contain
 * '=': parse splits each segment on its first '=' only.) */
final case class ColumnValue(column: PartitionColumn, value: String) {
  require(value.nonEmpty, s"partition value for ${column.name} must be non-empty")
  require(!value.contains("/"),
    s"partition value for ${column.name} must not contain '/': '$value'")
}

/**
 * A concrete table partition, e.g. `event_date=2019-02-09` or the
 * multi-column `event_date=2019-02-09/processed_date=2019-02-10`.
 *
 * Render/parse semantics mirror reference `model.scala:10-25,45-69`.
 */
final case class Partition(columnValues: List[ColumnValue]) {
  require(columnValues.nonEmpty, "a partition must have at least one column value")

  /** Hive-style relative path for this partition under the table location. */
  def resolvePath(tableLocation: URI): URI =
    Partition.normalizedDir(tableLocation).resolve(hivePath + "/")

  /** `col1=v1/col2=v2` rendering. */
  def hivePath: String =
    columnValues.map(cv => s"${cv.column.name}=${cv.value}").mkString("/")

  override def toString: String = hivePath
}

object Partition {

  def apply(first: ColumnValue, rest: ColumnValue*): Partition =
    Partition((first +: rest).toList)

  def apply(column: PartitionColumn, value: String): Partition =
    Partition(List(ColumnValue(column, value)))

  /** Parse `col=v[/col2=v2...]` back into a Partition. Each segment splits
   * on its FIRST '=' only, so values may themselves contain '=' (e.g.
   * base64 `k=YWJjZA==`). Mirrors reference `model.scala:57-69`, which
   * accepts `(.+)` as the value. */
  def parse(path: String): Either[String, Partition] = {
    def segment(seg: String): Either[String, ColumnValue] = {
      val eq = seg.indexOf('=')
      if (eq <= 0 || eq == seg.length - 1)
        Left(s"partition path segment is not of the form name=value: '$seg'")
      else {
        val name = seg.substring(0, eq)
        if (!name.matches("[a-zA-Z_][a-zA-Z0-9_]*"))
          Left(s"invalid partition column name: '$name'")
        else Right(ColumnValue(PartitionColumn(name), seg.substring(eq + 1)))
      }
    }
    val segments = path.stripPrefix("/").stripSuffix("/").split("/").toList
    val parsed = segments.map(segment)
    val (errs, oks) = parsed.partitionMap(identity)
    if (errs.nonEmpty) Left(errs.mkString("; "))
    else if (oks.isEmpty) Left(s"empty partition path: '$path'")
    else Right(Partition(oks))
  }

  /** Ensure a URI behaves as a directory for `resolve`. */
  private[graft] def normalizedDir(uri: URI): URI =
    if (uri.toString.endsWith("/")) uri else new URI(uri.toString + "/")
}

/** The partition columns of a table. The empty list means "snapshot table".
 * Reference `model.scala:76-83`. */
final case class PartitionSchema(columns: List[PartitionColumn])

object PartitionSchema {
  /** Sentinel: a snapshot (non-partitioned) table. */
  val snapshot: PartitionSchema = PartitionSchema(Nil)
}

/** Fully qualified table name `schema.name`. Reference `model.scala:89-91`.
 *
 * Both parts must be plain identifiers (`[A-Za-z0-9_]+`): the name is
 * embedded verbatim in commit-log file paths and DDL text, so characters
 * like '/', '..' or '`' would escape the log directory or malform
 * statements — and distinct names like `a.b_c` vs `a_b.c` must never
 * collide onto one log file. */
final case class TableName(schema: String, name: String) {
  require(TableName.isIdentifier(schema), s"invalid schema identifier: '$schema'")
  require(TableName.isIdentifier(name), s"invalid table identifier: '$name'")
  def fullyQualifiedName: String = s"$schema.$name"
}

object TableName {
  private val Identifier = "[A-Za-z0-9_]+"

  def isIdentifier(s: String): Boolean = s.matches(Identifier)

  /** Parse `schema.name`. Consistent Either-style errors with
   * `Version.parse` / `Partition.parse`. */
  def fromFullyQualified(s: String): Either[String, TableName] = {
    val dot = s.indexOf('.')
    if (dot <= 0 || dot == s.length - 1)
      Left(s"not a schema.name table name: '$s'")
    else {
      val (schema, name) = (s.substring(0, dot), s.substring(dot + 1))
      if (!isIdentifier(schema) || !isIdentifier(name))
        Left(s"table name parts must match [A-Za-z0-9_]+: '$s'")
      else Right(TableName(schema, name))
    }
  }
}

/** Storage format of a table — an opaque string handed to Spark's
 * `DataFrameWriter.format` / `DataFrameReader.format`.
 * Reference `model.scala:104-109`. */
final case class FileFormat(name: String)

object FileFormat {
  val Parquet: FileFormat = FileFormat("parquet")
  val Orc: FileFormat     = FileFormat("orc")
}

/** Definition of a versioned table. Reference `model.scala:93-95`. */
final case class TableDefinition(
    name: TableName,
    location: URI,
    partitionSchema: PartitionSchema,
    format: FileFormat) {
  def isSnapshot: Boolean = partitionSchema == PartitionSchema.snapshot
}

/**
 * The version state of a table at a point in history.
 * Reference `model.scala:100-102`.
 */
sealed trait TableVersion
final case class PartitionedTableVersion(partitionVersions: Map[Partition, Version]) extends TableVersion
final case class SnapshotTableVersion(version: Version) extends TableVersion
