package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

class ChangeFeedSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("cf-test")

  private def multisetEqual(a: DataFrame, b: DataFrame): Unit = {
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
  }

  private def freshTable(name: String): (VersionContext, InMemoryTableVersions, TableDefinition) = {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", name),
      Files.createTempDirectory(s"graft_$name").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    (ctx, log, table)
  }

  test("partition rewrite + DV delete in an unchanged partition: feed is exact and replays") {
    val (ctx, log, table) = freshTable("cf_mixed")
    // v1: 3 partitions, ids keyed so partition membership is readable
    (1L to 90L).map(i => Event(i, s"k$i", s"2024-01-0${i % 3 + 1}"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)

    // rewrite ONLY date=2024-01-02 (ids ≡ 1 mod 3) with halved contents
    (1L to 90L).filter(i => i % 3 == 1 && i <= 45)
      .map(i => Event(i + 1000, s"new$i", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v2: refresh d2"))

    // DV delete in date=2024-01-01 (ids ≡ 0 mod 3), whose version did NOT move
    DeletionVectors.delete(
      ctx, log, table,
      col("date") === "2024-01-01" && col("id") % 2 === 0,
      user, UpdateMessage("dv")) shouldBe 15L
    val head = log.currentCommit(table.name)

    val feed = ChangeFeed.read(spark, log, table, Some(v1), head)
    feed.columns should contain(ChangeFeed.ChangeTypeCol)

    val deletes = feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete)
    val inserts = feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert)
    // deletes: the 30 old rows of the rewritten d2 + the 15 newly-hidden d1 rows
    deletes.count() shouldBe 45L
    deletes.where(col("date") === "2024-01-01").count() shouldBe 15L
    deletes.where(col("date") === "2024-01-02").count() shouldBe 30L
    deletes.where(col("date") === "2024-01-03").count() shouldBe 0L
    // inserts: the 15 new d2 rows only
    inserts.count() shouldBe 15L
    inserts.select("id").as[Long].collect().foreach(_ should be > 1000L)

    // replay contract: from-state + feed == to-state (both DV-applied)
    val fromState = DeletionVectors.read(spark, log, table, Some(v1))
    val toState = DeletionVectors.read(spark, log, table, Some(head))
    multisetEqual(ChangeFeed.replay(fromState, feed), toState)
  }

  test("append-only range emits only inserts; quiet range emits an empty typed feed") {
    val (ctx, log, table) = freshTable("cf_append")
    (1L to 10L).map(i => Event(i, s"k$i", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)
    (11L to 20L).map(i => Event(i, s"k$i", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v2: new partition"))
    val v2 = log.currentCommit(table.name)

    val feed = ChangeFeed.read(spark, log, table, Some(v1), v2)
    feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete).count() shouldBe 0L
    feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert).count() shouldBe 10L

    // from == to: zero rows, schema intact (downstream references resolve)
    val quiet = ChangeFeed.read(spark, log, table, Some(v2), v2)
    quiet.count() shouldBe 0L
    quiet.columns should contain(ChangeFeed.ChangeTypeCol)

    // from = None (the void): everything visible at `to` is an insert
    val fromVoid = ChangeFeed.read(spark, log, table, None, v2)
    fromVoid.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete).count() shouldBe 0L
    fromVoid.count() shouldBe 20L
  }

  test("snapshot tables: full replace emits delete+insert; a DV-only range emits just the hidden rows") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "cf_snap"),
      Files.createTempDirectory("graft_cf_snap").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    (1L to 30L).map(i => Event(i, s"k$i", "d")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)

    // DV-only range
    DeletionVectors.delete(
      ctx, log, table, col("id") <= 5, user, UpdateMessage("dv")) shouldBe 5L
    val afterDv = log.currentCommit(table.name)
    val dvFeed = ChangeFeed.read(spark, log, table, Some(v1), afterDv)
    dvFeed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert).count() shouldBe 0L
    val dvDeletes = dvFeed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete)
    dvDeletes.count() shouldBe 5L
    dvDeletes.select("id").as[Long].collect().toSet shouldBe (1L to 5L).toSet

    // full replace: visible-at-from deletes (25 — the DV'd 5 were already
    // gone), new snapshot inserts
    (101L to 110L).map(i => Event(i, s"k$i", "d")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2: replace"))
    val v2 = log.currentCommit(table.name)
    val feed = ChangeFeed.read(spark, log, table, Some(afterDv), v2)
    feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete).count() shouldBe 25L
    feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert).count() shouldBe 10L

    // replay across the whole history (v1 → v2) reconstructs the final state
    val full = ChangeFeed.read(spark, log, table, Some(v1), v2)
    multisetEqual(
      ChangeFeed.replay(DeletionVectors.read(spark, log, table, Some(v1)), full),
      DeletionVectors.read(spark, log, table, Some(v2)))
  }

  test("snapshot table with live overlay + live DVs: the hidden-row scan resolves (MOR update feed)") {
    // the exact state after a merge-on-read UPDATE: the raw read at `to`
    // is a Union (base scan + overlay leaves), and Union carries no
    // _metadata — the hidden-row scan must come pointer-attached per scan
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "cf_snap_mor"),
      Files.createTempDirectory("graft_cf_snap_mor").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    (1L to 20L).map(i => Event(i, s"k$i", "d")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)

    // live overlay (MOR append), then a MOR UPDATE that vector-hides
    // base AND overlay rows while adding postimage overlay rows
    RowOverlay.append(
      Seq(Event(100L, "o1", "d"), Event(101L, "o2", "d")).toDF(),
      ctx, table, user, UpdateMessage("mor append"))
    val afterAppend = log.currentCommit(table.name)
    RowOverlay.update(
      ctx, table, col("id") === 3L || col("id") === 100L,
      Seq("kind" -> org.apache.spark.sql.functions.lit("upd")),
      user, UpdateMessage("mor update")) shouldBe 2L
    val head = log.currentCommit(table.name)

    // the append range: pure overlay inserts
    val appendFeed = ChangeFeed.read(spark, log, table, Some(v1), afterAppend)
    appendFeed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert)
      .count() shouldBe 2L
    appendFeed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete)
      .count() shouldBe 0L

    // the update range crosses live DVs + a live overlay at BOTH endpoints
    val updFeed = ChangeFeed.read(spark, log, table, Some(afterAppend), head)
    val dels = updFeed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete)
    dels.count() shouldBe 2L
    dels.select("id").as[Long].collect().toSet shouldBe Set(3L, 100L)
    val ins = updFeed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert)
    ins.count() shouldBe 2L
    ins.select("kind").as[String].collect().toSet shouldBe Set("upd")

    // replay across every sub-range and the whole range
    multisetEqual(
      ChangeFeed.replay(
        DeletionVectors.read(spark, log, table, Some(afterAppend)), updFeed),
      DeletionVectors.read(spark, log, table, Some(head)))
    multisetEqual(
      ChangeFeed.replay(
        DeletionVectors.read(spark, log, table, Some(v1)),
        ChangeFeed.read(spark, log, table, Some(v1), head)),
      DeletionVectors.read(spark, log, table, Some(head)))
  }

  test("the feed composes across an in-range overlay squash; refuses only vacuumed sources or post-squash DV moves") {
    val (ctx, log, table) = freshTable("cf_squash")
    (1L to 12L).map(i => Event(i, "base", s"2024-01-0${i % 2 + 1}"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    RowOverlay.append(
      Seq(Event(100L, "pre", "2024-01-01")).toDF(), ctx, table, user, UpdateMessage("pre"))
    val from = log.currentCommit(table.name)

    // in-range: two appends, then a squash, then another append
    RowOverlay.append(
      Seq(Event(101L, "in1", "2024-01-01")).toDF(), ctx, table, user, UpdateMessage("in1"))
    RowOverlay.append(
      Seq(Event(102L, "in2", "2024-01-02")).toDF(), ctx, table, user, UpdateMessage("in2"))
    RowOverlay.squash(spark, ctx, table, user, UpdateMessage("squash")) shouldBe true
    RowOverlay.append(
      Seq(Event(103L, "post", "2024-01-01")).toDF(), ctx, table, user, UpdateMessage("post"))
    val head = log.currentCommit(table.name)

    // the range crosses the squash: in-range appends attribute exactly
    // (the pre-range row 100 re-homed by the squash is NOT an insert)
    val feed = ChangeFeed.read(spark, log, table, Some(from), head)
    val ins = feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert)
    ins.select("id").as[Long].collect().toSet shouldBe Set(101L, 102L, 103L)
    feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete).count() shouldBe 0L
    // replay contract holds across the squash
    multisetEqual(
      ChangeFeed.replay(DeletionVectors.read(spark, log, table, Some(from)), feed),
      DeletionVectors.read(spark, log, table, Some(head)))
    // the partition-granular diff composes too
    val changes = VersionedReader(spark, log).readChanges(table, from, head)
    changes.select("id").as[Long].collect().toSet shouldBe Set(101L, 102L, 103L)

    // a DV delete AFTER the squash re-keys hiding — the crossing range
    // refuses with the re-anchor remediation; a post-squash range serves it
    DeletionVectors.delete(
      ctx, log, table, col("id") === 101L, user, UpdateMessage("post-squash dv")) shouldBe 1L
    val head2 = log.currentCommit(table.name)
    val thrown = intercept[IllegalStateException] {
      ChangeFeed.read(spark, log, table, Some(from), head2).count()
    }
    thrown.getMessage should include("re-anchor")
    val squashCommit = log.updates(table.name)
      .find(_.message.content == "squash").get.id
    val postFeed = ChangeFeed.read(spark, log, table, Some(squashCommit), head2)
    postFeed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete)
      .select("id").as[Long].collect().toSet shouldBe Set(101L)
    postFeed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert)
      .select("id").as[Long].collect().toSet shouldBe Set(103L)

    // vacuumed pre-squash sources: the crossing range refuses loudly
    val fs = org.apache.hadoop.fs.FileSystem.get(
      table.location, spark.sessionState.newHadoopConf())
    log.updates(table.name).filter(m =>
      Set("pre", "in1", "in2").contains(m.message.content)).foreach { m =>
      fs.delete(new org.apache.hadoop.fs.Path(
        RowOverlay.appendsDir(table, m.id)), true)
    }
    val gone = intercept[IllegalStateException] {
      ChangeFeed.read(spark, log, table, Some(from), head).count()
    }
    gone.getMessage should include("vacuum")
  }

  test("the feed speaks the to-state's logical schema across a mid-range rename") {
    val (ctx, log, table) = freshTable("cf_mapped")
    (1L to 10L).map(i => Event(i, s"k$i", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)
    ColumnMapping.rename(spark, ctx, table, "kind", "category", user)
    // rewrite the partition under the new logical name
    (1L to 5L).map(i => (i + 100L, s"new$i", "2024-01-01"))
      .toDF("id", "category", "date")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2"))
    val head = log.currentCommit(table.name)

    val feed = ChangeFeed.read(spark, log, table, Some(v1), head)
    // uniform CURRENT logical schema — the old generation's deletes
    // project under the new name too (Delta-CDF latest-schema posture)
    feed.columns should contain("category")
    feed.columns should not contain "kind"
    feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete).count() shouldBe 10L
    feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert).count() shouldBe 5L
    // replay under the CURRENT logical view (the from-state projected
    // through the to-state's mapping — the feed's own column space)
    // reconstructs the current logical state
    val base = ColumnMapping.applyLogical(
      DeletionVectors.read(spark, log, table, Some(v1)),
      spark, log, table, Some(head)).select("id", "category", "date")
    val replayed = ChangeFeed.replay(
      base, feed.select("id", "category", "date", ChangeFeed.ChangeTypeCol))
    val now = ColumnMapping.read(spark, log, table, Some(head))
      .select("id", "category", "date")
    replayed.exceptAll(now).count() shouldBe 0L
    now.exceptAll(replayed).count() shouldBe 0L
  }

  test("readChanges refuses a range whose DVs hid rows, and still serves DV-free ranges") {
    val (ctx, log, table) = freshTable("cf_refuse")
    (1L to 30L).map(i => Event(i, s"k$i", s"2024-01-0${i % 3 + 1}"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)
    DeletionVectors.delete(
      ctx, log, table, col("id") <= 6, user, UpdateMessage("dv")) shouldBe 6L
    val postDv = log.currentCommit(table.name)
    (31L to 35L).map(i => Event(i, s"k$i", "2024-01-09"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v2"))
    val v2 = log.currentCommit(table.name)

    val reader = VersionedReader(spark, log)
    // spanning the DV commit: refuse, pointing at the change feed
    val ex = the[IllegalStateException] thrownBy reader.readChanges(table, v1, v2)
    ex.getMessage should include("ChangeFeed")
    // the same logical range through the feed: 6 deletes + 5 inserts
    val feed = ChangeFeed.read(spark, log, table, Some(v1), v2)
    feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete).count() shouldBe 6L
    feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert).count() shouldBe 5L
    // a range NOT crossing the delete (vectors identical at both ends) is fine
    reader.readChanges(table, postDv, v2).count() shouldBe 5L
  }

  test("keyed feed: no-op suppression, update pairing, and replay of the extended vocabulary") {
    val (ctx, log, table) = freshTable("cf_keyed")
    // one partition, 10 unique keys
    (1L to 10L).map(i => Event(i, s"k$i", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)
    // rewrite: ids 1-4 unchanged (suppress), 5-7 rekinded (update),
    // 8-10 dropped (delete), 11-12 fresh (insert)
    ((1L to 4L).map(i => Event(i, s"k$i", "2024-01-01")) ++
      (5L to 7L).map(i => Event(i, s"CHANGED$i", "2024-01-01")) ++
      (11L to 12L).map(i => Event(i, s"k$i", "2024-01-01")))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v2"))
    val head = log.currentCommit(table.name)

    val feed = ChangeFeed.readKeyed(spark, log, table, Some(v1), head, Seq("id"))
    def ofType(t: String) = feed.where(col(ChangeFeed.ChangeTypeCol) === t)
    // ids 1-4 appear nowhere
    feed.where(col("id") <= 4).count() shouldBe 0L
    ofType(ChangeFeed.UpdatePre).select("id").as[Long].collect().sorted shouldBe Array(5L, 6L, 7L)
    ofType(ChangeFeed.UpdatePre).select("kind").as[String].collect().foreach(_ should startWith("k"))
    ofType(ChangeFeed.UpdatePost).select("kind").as[String].collect().foreach(_ should startWith("CHANGED"))
    ofType(ChangeFeed.Delete).select("id").as[Long].collect().sorted shouldBe Array(8L, 9L, 10L)
    ofType(ChangeFeed.Insert).select("id").as[Long].collect().sorted shouldBe Array(11L, 12L)

    val fromState = DeletionVectors.read(spark, log, table, Some(v1))
    val toState = DeletionVectors.read(spark, log, table, Some(head))
    multisetEqual(ChangeFeed.replay(fromState, feed), toState)
  }

  test("the 4-arg table_changes TVF serves the keyed feed from SQL text") {
    val (ctx, log, table) = freshTable("cf_sqlkeyed")
    spark.conf.set("spark.sql.catalog.graftcfk", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("graftcfk", log)
    GraftTableCatalog.register("graftcfk", table)
    (1L to 6L).map(i => Event(i, s"k$i", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)
    // ids 1-4 unchanged, 5 rekinded, 6 dropped
    ((1L to 4L).map(i => Event(i, s"k$i", "2024-01-01")) :+ Event(5L, "NEW", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v2"))
    val head = log.currentCommit(table.name)

    val rows = spark.sql(
      s"""SELECT _change_type, id, kind
         |FROM table_changes('graftcfk.${table.name.schema}.${table.name.name}',
         |                   '${v1.id}', '${head.id}', 'id')
         |ORDER BY _change_type, id""".stripMargin)
      .as[(String, Long, String)].collect()
    rows shouldBe Array(
      ("delete", 6L, "k6"),
      (ChangeFeed.UpdatePost, 5L, "NEW"),
      (ChangeFeed.UpdatePre, 5L, "k5"))
  }

  test("keyed feed with duplicate keys: rank-paired 1-1, remainders stay plain, replay exact") {
    val (ctx, log, table) = freshTable("cf_dupkeys")
    // key id=1 has THREE rows at v1, id=2 has one
    Seq(Event(1L, "a", "2024-01-01"), Event(1L, "b", "2024-01-01"),
        Event(1L, "c", "2024-01-01"), Event(2L, "x", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)
    // v2 keeps one id=1 row changed, drops the other two; id=2 unchanged
    Seq(Event(1L, "z", "2024-01-01"), Event(2L, "x", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v2"))
    val head = log.currentCommit(table.name)

    val feed = ChangeFeed.readKeyed(spark, log, table, Some(v1), head, Seq("id"))
    def ofType(t: String) = feed.where(col(ChangeFeed.ChangeTypeCol) === t)
    // id=2 suppressed entirely; id=1: deletes {a,b,c} vs insert {z} —
    // rank 1 pairs (a → z), b and c remain plain deletes
    feed.where(col("id") === 2L).count() shouldBe 0L
    ofType(ChangeFeed.UpdatePre).select("kind").as[String].collect() shouldBe Array("a")
    ofType(ChangeFeed.UpdatePost).select("kind").as[String].collect() shouldBe Array("z")
    ofType(ChangeFeed.Delete).select("kind").as[String].collect().sorted shouldBe Array("b", "c")
    ofType(ChangeFeed.Insert).count() shouldBe 0L

    val fromState = DeletionVectors.read(spark, log, table, Some(v1))
    val toState = DeletionVectors.read(spark, log, table, Some(head))
    multisetEqual(ChangeFeed.replay(fromState, feed), toState)
  }

  test("plan pin: a feed consumer's projection prunes the underlying scans (MV-refresh shape)") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val t = TableDefinition(
      TableName("db", "cf_prune"),
      Files.createTempDirectory("graft_cf_prune").toUri,
      PartitionSchema(List(PartitionColumn("grp"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    (1L to 40L).map(i => (i, s"wide_payload_$i", i * 2.5, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "payload", "price", "grp")
      .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    val anchor = log.currentCommit(t.name)
    (1L to 10L).map(i => (i + 100, s"new_$i", i * 1.5, "a")).toDF("id", "payload", "price", "grp")
      .versionedInsertInto(ctx, t, user, UpdateMessage("v2: rewrite a"))
    DeletionVectors.delete(ctx, log, t, col("id") === 3L, user, UpdateMessage("dv in b"))
    val head = log.currentCommit(t.name)

    // the MV-refresh consumer shape: group cols + one agg input; the feed
    // union (rewrite deletes+inserts, DV deletes) must NOT read the wide
    // untouched columns — Catalyst pushes the projection through the
    // unions, the DV (file,pos) joins, and the column-mapping projections
    // down to every parquet scan
    val feed = ChangeFeed.read(spark, log, t, Some(anchor), head)
    val agg = feed.groupBy("grp")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert, col("id"))).as("s"))
    val p = agg.queryExecution.executedPlan.toString
    val readSchemas = p.split("ReadSchema: ").drop(1).map(_.takeWhile(_ != '\n'))
    readSchemas should not be empty
    readSchemas.foreach { rs =>
      rs should not include "payload"
      rs should not include "price"
    }
  }
}
