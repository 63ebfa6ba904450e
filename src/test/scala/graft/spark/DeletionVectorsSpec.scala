package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

class DeletionVectorsSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("dv-test")

  test("DV delete hides scattered rows without moving version pointers; time travel sees them") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "dv_part"),
      Files.createTempDirectory("graft_dv_part").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    (1L to 100L).map(i => Event(i, s"k$i", s"2024-01-0${i % 3 + 1}"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val preDelete = log.currentCommit(table.name)
    val v1 = log.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) => pvs
      case other                        => fail(s"unexpected $other")
    }

    // a scattered predicate touches every partition — copy-on-write would
    // rewrite the whole table; the DV delete writes only a sidecar
    val n = DeletionVectors.delete(
      ctx, log, table, col("id") % 10 === 0, user, UpdateMessage("dv delete %10"))
    n shouldBe 10L

    // 1 new commit, ZERO version-pointer movement, zero data writes
    log.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) => pvs shouldBe v1
      case other                        => fail(s"unexpected $other")
    }
    log.updates(table.name).head.message.content shouldBe "dv delete %10"

    val visible = DeletionVectors.read(spark, log, table)
    visible.count() shouldBe 90L
    visible.where(col("id") % 10 === 0).count() shouldBe 0L
    // the raw reader still sees every physical row (merge-on-READ)
    VersionedReader(spark, log).read(table).count() shouldBe 100L
    // time travel to the pre-delete commit shows the deleted rows
    DeletionVectors.read(spark, log, table, Some(preDelete)).count() shouldBe 100L

    // second delete COMPOSES cumulatively; re-deleting hidden rows is a no-op
    DeletionVectors.delete(
      ctx, log, table, col("id") % 7 === 0, user, UpdateMessage("dv delete %7")) shouldBe 13L // 14 multiples of 7, but 70 is already hidden
    DeletionVectors.delete(
      ctx, log, table, col("id") % 7 === 0, user, UpdateMessage("noop")) shouldBe 0L
    val after2 = DeletionVectors.read(spark, log, table)
    after2.count() shouldBe 77L // 100 - 10 - 13
    // no-match deletes commit nothing
    log.updates(table.name).map(_.message.content) should not contain "noop"

    // a COMPACTION rewrite absorbs the vectors: the rewritten files carry
    // only surviving rows, and the old pairs become dead no-ops
    Compaction.compact(spark, ctx, table, user, UpdateMessage("optimize"))
    val compacted = DeletionVectors.read(spark, log, table)
    compacted.count() shouldBe 77L
    VersionedReader(spark, log).read(table).count() shouldBe 77L // physically gone
  }

  test("DV sidecars round-trip the durable log and snapshot tables") {
    val dir = Files.createTempDirectory("graft_dv_log")
    val log = new JsonFileTableVersions(dir)
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "dv_snap"),
      Files.createTempDirectory("graft_dv_snap").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    (1L to 50L).map(i => Event(i, s"k$i", "d")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    DeletionVectors.delete(
      ctx, log, table, col("id") <= 5, user, UpdateMessage("dv")) shouldBe 5L

    // a fresh process (re-opened log) still applies the sidecar
    val reopened = new JsonFileTableVersions(dir)
    DeletionVectors.read(spark, reopened, table).count() shouldBe 45L

    // a snapshot REWRITE replaces every file — the old vectors reference
    // replaced paths and become dead no-ops, never corrupting the new state
    (51L to 60L).map(i => Event(i, s"k$i", "d")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2: full replace"))
    DeletionVectors.read(spark, log, table).count() shouldBe 10L
  }
}
