package graft.core

import java.net.URI

/**
 * Pure functions mapping (location, partition, version) to concrete storage
 * paths and back.
 *
 * Layout (reference `core/src/main/scala/com/gu/tableversions/core/VersionPaths.scala:15-51`):
 *  - snapshot table version:     `<tableLocation>/<versionLabel>/`
 *  - partitioned table version:  `<tableLocation>/<col=v[/...]>/<versionLabel>/`
 *  - `Unversioned` maps to the bare (un-suffixed) path, so pre-existing data
 *    keeps its original location.
 */
object VersionPaths {

  /** Path of a specific version of a whole snapshot table. */
  def pathFor(tableLocation: URI, version: Version): URI =
    version match {
      case Version.Unversioned => Partition.normalizedDir(tableLocation)
      case v                   => Partition.normalizedDir(tableLocation).resolve(v.label + "/")
    }

  /** Path of a specific version of a single partition.
    *
    * LOG/DISPLAY LAYER ONLY: this resolves the RAW `hivePath` through
    * `java.net.URI`, which throws on spaces/bare '%' and truncates at
    * '#'/'?' — and real storage dirs are HIVE-ESCAPED. Storage paths must
    * come from `graft.spark.SparkPaths.dirFor`. */
  def pathFor(tableLocation: URI, partition: Partition, version: Version): URI =
    pathFor(partition.resolvePath(tableLocation), version)

  /** Versioned paths for every partition in a mapping. */
  def resolveVersionedPartitionPaths(
      partitionVersions: Map[Partition, Version],
      tableLocation: URI): Map[Partition, URI] =
    partitionVersions.map { case (p, v) => p -> pathFor(tableLocation, p, v) }

  /** Parse the version out of a versioned path: the last path segment if it
   * is a well-formed version label, else `Unversioned`.
   * Reference `VersionPaths.scala:27-35`. */
  def parseVersion(path: URI): Version = {
    val last = path.toString.stripSuffix("/").split('/').lastOption.getOrElse("")
    Version.parse(last).getOrElse(Version.Unversioned)
  }

  /** Strip a trailing version label from a path, yielding the base
   * (table or partition) path. Reference `VersionPaths.scala:40-51`. */
  def versionedToBasePath(path: URI): URI =
    parseVersion(path) match {
      case Version.Unversioned => path
      case v =>
        new URI(path.toString.stripSuffix("/").stripSuffix(v.label).stripSuffix("/") + "/")
    }
}
