package graft.core

import java.net.URI
import java.time.Instant
import java.util.UUID

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import Metastore.{TableChanges, TableOperation}

/** Contract of a `Metastore` implementation, ported from the reference's
  * shared suite (`core/src/test/scala/com/gu/tableversions/core/MetastoreSpec.scala:14-199`):
  * snapshot version cycling incl. revert, partition add/update/remove,
  * unknown-table errors, and failed updates leaving state unchanged.
  */
class InMemoryMetastoreSpec extends AnyFunSuite with Matchers {

  private def v() = Version(Instant.now(), UUID.randomUUID())
  private def p(d: String) = Partition(PartitionColumn("date"), d)

  private def snapshotTable(name: String) = TableDefinition(
    TableName("db", name), new URI(s"file:///tmp/db/$name"),
    PartitionSchema.snapshot, FileFormat.Parquet)

  private def partitionedTable(name: String) = TableDefinition(
    TableName("db", name), new URI(s"file:///tmp/db/$name"),
    PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)

  test("a registered snapshot table starts Unversioned and cycles versions incl. revert") {
    val ms = new InMemoryMetastore
    val t = snapshotTable("snap")
    ms.register(t)
    ms.currentVersion(t.name) shouldBe SnapshotTableVersion(Version.Unversioned)

    val (v1, v2) = (v(), v())
    ms.update(t.name, TableChanges(TableOperation.UpdateTableVersion(v1)))
    ms.currentVersion(t.name) shouldBe SnapshotTableVersion(v1)
    ms.update(t.name, TableChanges(TableOperation.UpdateTableVersion(v2)))
    ms.currentVersion(t.name) shouldBe SnapshotTableVersion(v2)
    // revert
    ms.update(t.name, TableChanges(TableOperation.UpdateTableVersion(v1)))
    ms.currentVersion(t.name) shouldBe SnapshotTableVersion(v1)
  }

  test("partition add / update / remove cycle") {
    val ms = new InMemoryMetastore
    val t = partitionedTable("part")
    ms.register(t)
    val (v1, v2) = (v(), v())

    ms.update(t.name, TableChanges(
      TableOperation.AddPartition(p("2024-01-01"), v1),
      TableOperation.AddPartition(p("2024-01-02"), v1)))
    ms.currentVersion(t.name) shouldBe PartitionedTableVersion(
      Map(p("2024-01-01") -> v1, p("2024-01-02") -> v1))

    ms.update(t.name, TableChanges(TableOperation.UpdatePartitionVersion(p("2024-01-02"), v2)))
    ms.currentVersion(t.name) shouldBe PartitionedTableVersion(
      Map(p("2024-01-01") -> v1, p("2024-01-02") -> v2))

    ms.update(t.name, TableChanges(TableOperation.RemovePartition(p("2024-01-01"))))
    ms.currentVersion(t.name) shouldBe PartitionedTableVersion(Map(p("2024-01-02") -> v2))
  }

  test("re-adding an existing partition is a no-op (ADD IF NOT EXISTS)") {
    val ms = new InMemoryMetastore
    val t = partitionedTable("readd")
    ms.register(t)
    val (v1, v2) = (v(), v())
    ms.update(t.name, TableChanges(TableOperation.AddPartition(p("2024-01-01"), v1)))
    ms.update(t.name, TableChanges(TableOperation.AddPartition(p("2024-01-01"), v2)))
    ms.currentVersion(t.name) shouldBe PartitionedTableVersion(Map(p("2024-01-01") -> v1))
  }

  test("removing a missing partition is a no-op (DROP IF EXISTS)") {
    val ms = new InMemoryMetastore
    val t = partitionedTable("dropmissing")
    ms.register(t)
    noException should be thrownBy ms.update(
      t.name, TableChanges(TableOperation.RemovePartition(p("2024-01-01"))))
  }

  test("operations on an unregistered table fail") {
    val ms = new InMemoryMetastore
    val ghost = TableName("db", "ghost")
    an[Exception] should be thrownBy ms.currentVersion(ghost)
    an[Exception] should be thrownBy ms.update(
      ghost, TableChanges(TableOperation.UpdateTableVersion(v())))
  }

  test("updating an unknown partition fails and leaves state unchanged") {
    val ms = new InMemoryMetastore
    val t = partitionedTable("failupdate")
    ms.register(t)
    val v1 = v()
    ms.update(t.name, TableChanges(TableOperation.AddPartition(p("2024-01-01"), v1)))
    an[Exception] should be thrownBy ms.update(t.name, TableChanges(
      TableOperation.UpdatePartitionVersion(p("2024-01-02"), v()),
      TableOperation.RemovePartition(p("2024-01-01")))) // must NOT be applied either
    ms.currentVersion(t.name) shouldBe PartitionedTableVersion(Map(p("2024-01-01") -> v1))
  }

  test("register is idempotent") {
    val ms = new InMemoryMetastore
    val t = snapshotTable("regtwice")
    ms.register(t)
    val v1 = v()
    ms.update(t.name, TableChanges(TableOperation.UpdateTableVersion(v1)))
    ms.register(t)
    ms.currentVersion(t.name) shouldBe SnapshotTableVersion(v1)
  }
}

/** Pure-function tests of the version diff, ported from the reference's
  * `core/src/test/scala/com/gu/tableversions/core/MetastoreObjectSpec.scala:15-77`. */
class ComputeChangesSpec extends AnyFunSuite with Matchers {

  private def v() = Version(Instant.now(), UUID.randomUUID())
  private def p(d: String) = Partition(PartitionColumn("date"), d)

  test("identical snapshot states diff to nothing") {
    val v1 = v()
    Metastore.computeChanges(SnapshotTableVersion(v1), SnapshotTableVersion(v1)) shouldBe
      TableChanges(Nil)
  }

  test("snapshot version change diffs to one UpdateTableVersion") {
    val (v1, v2) = (v(), v())
    Metastore.computeChanges(SnapshotTableVersion(v1), SnapshotTableVersion(v2)) shouldBe
      TableChanges(TableOperation.UpdateTableVersion(v2))
  }

  test("partitioned diff classifies added, removed and updated partitions") {
    val (v1, v2) = (v(), v())
    val before = PartitionedTableVersion(Map(p("a") -> v1, p("b") -> v1, p("c") -> v1))
    val after  = PartitionedTableVersion(Map(p("b") -> v1, p("c") -> v2, p("d") -> v2))
    val changes = Metastore.computeChanges(before, after).operations.toSet
    changes shouldBe Set(
      TableOperation.AddPartition(p("d"), v2),
      TableOperation.RemovePartition(p("a")),
      TableOperation.UpdatePartitionVersion(p("c"), v2))
  }

  test("identical partitioned states diff to nothing") {
    val v1 = v()
    val s = PartitionedTableVersion(Map(p("a") -> v1))
    Metastore.computeChanges(s, s) shouldBe TableChanges(Nil)
  }

  test("snapshot <-> partitioned transitions are illegal") {
    an[IllegalArgumentException] should be thrownBy
      Metastore.computeChanges(
        SnapshotTableVersion(v()), PartitionedTableVersion(Map(p("a") -> v())))
    an[IllegalArgumentException] should be thrownBy
      Metastore.computeChanges(
        PartitionedTableVersion(Map(p("a") -> v())), SnapshotTableVersion(v()))
  }
}
