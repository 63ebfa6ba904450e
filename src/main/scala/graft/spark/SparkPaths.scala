package graft.spark

import java.net.URI

import org.apache.spark.sql.GraftSqlShim

import graft.core.{Partition, Version}

/**
 * On-disk path construction for partition directories, matching Spark's own
 * Hive-style escaping: `partitionBy` writes `k=v` segments with specific
 * characters percent-escaped (`:`, `%`, control chars, …) while leaving
 * others — including spaces — literal. Everything this library renames,
 * registers, or reads must use the identical form.
 *
 * Paths are RAW strings, not `java.net.URI`: `URI.resolve` rejects literal
 * spaces and reinterprets `%xx`, whereas Hadoop's `Path(String)` (which
 * Spark uses for every load/save/DDL location) round-trips raw strings
 * correctly. `graft.core.VersionPaths` keeps the pure-URI form for the
 * log/display layer where values are unescaped.
 */
object SparkPaths {

  /** `k=v[/k2=v2]` with Spark/Hive escaping applied to names and values. */
  def escapedPartitionPath(p: Partition): String =
    p.columnValues
      .map(cv =>
        s"${GraftSqlShim.escapePathName(cv.column.name)}=${GraftSqlShim.escapePathName(cv.value)}")
      .mkString("/")

  /** Storage dir of one version of one partition:
    * `<location>/<escaped k=v>/<label>` (raw string, no trailing slash). */
  def dirFor(tableLocation: URI, p: Partition, version: Version): String =
    Partition.normalizedDir(tableLocation).toString +
      escapedPartitionPath(p) + "/" + version.label
}
