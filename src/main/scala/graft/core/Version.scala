package graft.core

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset
import java.util.UUID
import scala.util.Try

/**
 * A table/partition version: creation timestamp + unique id, rendered as the
 * path label `yyyyMMdd-HHmmss.nnnnnnnnn-<uuid>` (sorts lexicographically by
 * creation time).
 *
 * Semantics mirror reference `core/src/main/scala/com/gu/tableversions/core/Version.scala:15-57`:
 * label render/parse round-trips, plus an `Unversioned` sentinel for
 * pre-existing data that was never written by the versioning layer.
 */
final case class Version(timestamp: Instant, uuid: UUID) {
  def label: String =
    if (this == Version.Unversioned) Version.UnversionedLabel
    else Version.TimestampFormat.format(timestamp) + "-" + uuid.toString
}

object Version {

  private[core] val TimestampFormat: DateTimeFormatter =
    DateTimeFormatter.ofPattern("uuuuMMdd-HHmmss.nnnnnnnnn").withZone(ZoneOffset.UTC)

  private val LabelRegex =
    """(\d{8}-\d{6}\.\d{9})-([0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12})""".r

  val UnversionedLabel = "Unversioned"

  /** Sentinel for data present before version tracking started
   * (reference `Version.scala:26-31`). */
  val Unversioned: Version = Version(Instant.MIN, new UUID(0, 0))

  /** Generate a fresh version for a new write. */
  def generateVersion(): Version = Version(Instant.now(), UUID.randomUUID())

  /** Parse a version label back into a Version; inverse of `label`. */
  def parse(label: String): Either[String, Version] = label match {
    case LabelRegex(ts, uuid) =>
      Try {
        val parsed = TimestampFormat.parse(ts)
        Version(Instant.from(parsed), UUID.fromString(uuid))
      }.toEither.left.map(e => s"Invalid version label '$label': ${e.getMessage}")
    case UnversionedLabel => Right(Unversioned)
    case other            => Left(s"Invalid version label: '$other'")
  }
}
