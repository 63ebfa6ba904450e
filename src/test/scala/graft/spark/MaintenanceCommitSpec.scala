package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{ConcurrentWriteException, UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/**
 * Commit discipline of the MAINTENANCE operators (OPTIMIZE / Z-ORDER /
 * auto-compact / REFRESH MATERIALIZED VIEW): each is a read-modify-write of
 * the state it read, so its commit must rebase over disjoint concurrent
 * writers and REFUSE — loudly, [[ConcurrentWriteException]] — when an
 * intervening commit overlaps what it rewrote. The lost-update shape these
 * pin down: an OPTIMIZE whose read resolved BEFORE a DV delete must never
 * pointer-flip the table back to pre-delete contents (silent resurrection
 * of deleted rows), and a racing writer's commit must never vanish under a
 * maintenance rewrite.
 *
 * Races are interleaved deterministically: the competing commit fires from
 * the `newVersion` hook of the maintenance op's [[VersionContext]] (called
 * after its read resolved, before its commit), or from
 * [[MaterializedView.interleaveForTest]] for the SQL-driven MV refresh.
 */
class MaintenanceCommitSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("maint-race")

  private def fresh(): (VersionContext, TableVersions) = {
    val log = new InMemoryTableVersions
    (VersionContext(VersionedMetastore(log, new InMemoryMetastore)), log)
  }

  /** A VersionContext sharing `ctx`'s log whose FIRST newVersion call runs
    * `effect` — the competing writer landing inside the race window. */
  private def interleaved(ctx: VersionContext)(effect: => Unit): VersionContext = {
    var fired = false
    ctx.copy(newVersion = () => {
      if (!fired) { fired = true; effect }
      Version.generateVersion()
    })
  }

  private def eventsTable(name: String): TableDefinition = TableDefinition(
    TableName("test", name),
    Files.createTempDirectory(s"graft_maint_$name").toUri,
    PartitionSchema(List(PartitionColumn("date"))),
    FileFormat.Parquet)

  test("OPTIMIZE racing a DV delete conflicts loudly and never resurrects the deleted rows") {
    val (ctx, log) = fresh()
    val table = eventsTable("opt_vs_dv")
    ctx.init(table, user, UpdateMessage("init"))
    val events = (1L to 40L).map(i => Event(i, s"k$i", if (i % 2 == 0) "2024-01-01" else "2024-01-02"))
    events.toDS().repartition(8)
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: fragmented"))

    // the delete lands between compact's read and its commit
    val racy = interleaved(ctx) {
      DeletionVectors.delete(
        ctx, log, table, col("id") <= 10, user, UpdateMessage("dv: drop 1..10"))
    }
    val before = log.currentCommit(table.name)
    a[ConcurrentWriteException] should be thrownBy
      Compaction.compact(spark, racy, table, user, UpdateMessage("optimize"))

    // the table serves the POST-delete state: rows 1..10 stay dead, the
    // compaction's staged dirs are unreferenced orphans
    val ids = DeletionVectors.read(spark, log, table).as[Event].collect().map(_.id).sorted
    ids shouldBe (11L to 40L).toArray
    // head is the DV commit, not a compaction commit
    log.updates(table.name).head.message.content should include("dv: drop")
    log.currentCommit(table.name) should not be before
  }

  test("Z-ORDER racing a DV delete conflicts loudly too") {
    val (ctx, log) = fresh()
    val table = TableDefinition(
      TableName("test", "zorder_vs_dv"),
      Files.createTempDirectory("graft_maint_zorder").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    (1L to 40L).map(i => Event(i, s"k$i", "2024-01-01")).toDS().repartition(4)
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    val racy = interleaved(ctx) {
      DeletionVectors.delete(
        ctx, log, table, col("id") > 30, user, UpdateMessage("dv: drop tail"))
    }
    a[ConcurrentWriteException] should be thrownBy
      ZOrder.zorderCompact(
        spark, racy, table, user, UpdateMessage("zorder"), Seq("id"), numFiles = 2)
    DeletionVectors.read(spark, log, table).as[Event].collect()
      .map(_.id).sorted shouldBe (1L to 30L).toArray
  }

  test("partition-scoped OPTIMIZE rebases over a disjoint-partition writer; both commits survive") {
    val (ctx, log) = fresh()
    val table = eventsTable("opt_disjoint")
    ctx.init(table, user, UpdateMessage("init"))
    val a = (1L to 20L).map(i => Event(i, s"k$i", "2024-01-01"))
    val b = (21L to 30L).map(i => Event(i, s"k$i", "2024-01-02"))
    (a ++ b).toDS().repartition(8)
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: fragmented"))

    val c = (31L to 35L).map(i => Event(i, s"k$i", "2024-01-03"))
    val racy = interleaved(ctx) {
      c.toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v2: new partition C"))
    }
    val partA = Partition(ColumnValue(PartitionColumn("date"), "2024-01-01"))
    // scopes are disjoint ({A} vs {C}): the rebase composes both commits
    Compaction.compact(
      spark, racy, table, user, UpdateMessage("optimize A"), partitions = Seq(partA))

    val all = VersionedReader(spark, log).read(table).as[Event].collect().sortBy(_.id)
    all shouldBe (a ++ b ++ c).toArray
    // the maintenance commit is the head AND the writer's commit is in history
    log.updates(table.name).head.message.content shouldBe "optimize A"
    log.updates(table.name).map(_.message.content) should contain("v2: new partition C")
  }

  test("partition-scoped OPTIMIZE overlapping a concurrent writer refuses; the writer's data wins") {
    val (ctx, log) = fresh()
    val table = eventsTable("opt_overlap")
    ctx.init(table, user, UpdateMessage("init"))
    (1L to 20L).map(i => Event(i, s"k$i", "2024-01-01")).toDS().repartition(8)
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: fragmented"))

    val replacement = (101L to 110L).map(i => Event(i, s"r$i", "2024-01-01"))
    val racy = interleaved(ctx) {
      replacement.toDS()
        .versionedInsertInto(ctx, table, user, UpdateMessage("v2: overwrite A"))
    }
    val partA = Partition(ColumnValue(PartitionColumn("date"), "2024-01-01"))
    a[ConcurrentWriteException] should be thrownBy
      Compaction.compact(
        spark, racy, table, user, UpdateMessage("optimize A"), partitions = Seq(partA))
    // the overwrite survives; the stale rewrite never replaced it
    VersionedReader(spark, log).read(table).as[Event].collect()
      .sortBy(_.id) shouldBe replacement.toArray
  }

  test("auto-compact inherits the rebase discipline (DV delete racing the rewrite conflicts)") {
    val (ctx, log) = fresh()
    val table = eventsTable("auto_vs_dv")
    ctx.init(table, user, UpdateMessage("init"))
    (1L to 30L).map(i => Event(i, s"k$i", "2024-01-01")).toDS().repartition(8)
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: fragmented"))

    val racy = interleaved(ctx) {
      DeletionVectors.delete(
        ctx, log, table, col("id") <= 5, user, UpdateMessage("dv: drop 1..5"))
    }
    a[ConcurrentWriteException] should be thrownBy
      Compaction.autoCompact(spark, racy, table, user, minFiles = 4)
    DeletionVectors.read(spark, log, table).as[Event].collect()
      .map(_.id).sorted shouldBe (6L to 30L).toArray
  }

  test("REFRESH MATERIALIZED VIEW racing another refresh: the stale one refuses, state stays consistent") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    spark.conf.set("spark.sql.catalog.mvrace", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("mvrace", log)
    val table = TableDefinition(
      TableName("db", "events"),
      Files.createTempDirectory("graft_maint_mvrace").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    GraftTableCatalog.register("mvrace", table)
    (1L to 20L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val mvLoc = Files.createTempDirectory("graft_maint_mvrace_loc").toUri
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvrace.db.by_kind LOCATION '$mvLoc'
         |AS SELECT kind, count(*) AS n, sum(id) AS sum_id
         |FROM mvrace.db.events GROUP BY kind""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvrace", TableName("db", "by_kind")).get._2

    (21L to 25L).map(i => Event(i, "even", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v2"))

    // the loser reads its MV state, then a competing refresh lands first
    var fired = false
    MaterializedView.interleaveForTest = () => {
      if (!fired) {
        fired = true
        MaterializedView.refresh(spark, "mvrace", mv, user)
      }
    }
    try {
      a[ConcurrentWriteException] should be thrownBy
        MaterializedView.refresh(spark, "mvrace", mv, user)
    } finally MaterializedView.interleaveForTest = () => ()

    // the winning refresh's state is intact and equals a full rebuild
    val got = VersionedReader(spark, log).read(mv).orderBy("kind")
      .as[(String, Long, Long)].collect()
    got shouldBe Array(("even", 15L, (2L to 20L by 2).sum + (21L to 25L).sum),
      ("odd", 10L, (1L to 19L by 2).sum))
    // and a retry of the loser is a clean no-op (already at head)
    MaterializedView.refresh(spark, "mvrace", mv, user)._3 shouldBe "no-op"
  }

  test("concurrent identity writers cannot mint overlapping ids: the stale stamper refuses") {
    val (ctx, log) = fresh()
    val table = TableDefinition(
      TableName("test", "ident_race"),
      Files.createTempDirectory("graft_maint_identrace").toUri,
      PartitionSchema(List(PartitionColumn("grp"))),
      FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    import spark.implicits._
    IdentityColumns.insertWithIdentity(
      (1L to 10L).map(i => (i, "a")).toDF("v", "grp"), ctx, table, "row_id",
      user, UpdateMessage("b1"))

    // the competing identity write lands between the loser's stamp and its
    // commit — DISJOINT partitions, so plain commits would compose and the
    // overlapping ids would land silently; the hwm CAS refuses instead
    val racy = interleaved(ctx) {
      IdentityColumns.insertWithIdentity(
        (100L to 104L).map(i => (i, "w")).toDF("v", "grp"), ctx, table, "row_id",
        user, UpdateMessage("winner"))
    }
    a[TableVersions.ConcurrentWriteException] should be thrownBy
      IdentityColumns.insertWithIdentity(
        (200L to 204L).map(i => (i, "l")).toDF("v", "grp"), racy, table, "row_id",
        user, UpdateMessage("loser"))

    // the surviving state: first batch + winner, every id unique
    val rows = VersionedReader(spark, log).read(table)
      .select("v", "row_id").as[(Long, Long)].collect()
    rows.length shouldBe 15
    rows.map(_._2).distinct.length shouldBe 15
    // a RETRY of the loser (fresh stamp off the advanced mark) lands clean
    IdentityColumns.insertWithIdentity(
      (200L to 204L).map(i => (i, "l")).toDF("v", "grp"), ctx, table, "row_id",
      user, UpdateMessage("loser retry"))
    val all = VersionedReader(spark, log).read(table)
      .select("row_id").as[Long].collect()
    all.length shouldBe 20
    all.distinct.length shouldBe 20
  }
}
