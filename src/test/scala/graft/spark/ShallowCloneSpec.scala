package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

class ShallowCloneSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("clone-test")

  private def freshContext(): (VersionContext, TableVersions) = {
    val log = new InMemoryTableVersions
    (VersionContext(VersionedMetastore(log, new InMemoryMetastore)), log)
  }

  private def partitionedTable(name: String): TableDefinition =
    TableDefinition(
      TableName("test", name),
      Files.createTempDirectory(s"graft_spec_$name").toUri,
      PartitionSchema(List(PartitionColumn("date"))),
      FileFormat.Parquet)

  test("a shallow clone serves the cloned state; writes to either side never leak to the other") {
    val (ctx, log) = freshContext()
    val src = partitionedTable("clone_src")
    ctx.init(src, user, UpdateMessage("init"))
    Seq(Event(1, "a", "2024-01-01"), Event(2, "b", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, src, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(src.name)
    Seq(Event(3, "c", "2024-01-03"))
      .toDS().versionedInsertInto(ctx, src, user, UpdateMessage("v2"))

    // clone at v1: sees exactly v1's two rows, no data copied
    val clone = ShallowClone.clone(
      spark, ctx, src, TableName("test", "clone_dst"), user, Some(v1))
    clone.location shouldBe src.location
    val reader = VersionedReader(spark, log)
    reader.read(clone).as[Event].collect().map(_.id).sorted shouldBe Array(1L, 2L)
    reader.read(src).as[Event].collect().map(_.id).sorted shouldBe Array(1L, 2L, 3L)

    // write to the clone: the source must not move
    val srcHead = log.currentCommit(src.name)
    Seq(Event(9, "z", "2024-01-01"), Event(10, "y", "2024-04-01"))
      .toDS().versionedInsertInto(ctx, clone, user, UpdateMessage("clone-w1"))
    log.currentCommit(src.name) shouldBe srcHead
    reader.read(clone).as[Event].collect().map(_.id).sorted shouldBe Array(2L, 9L, 10L)
    reader.read(src).as[Event].collect().map(_.id).sorted shouldBe Array(1L, 2L, 3L)

    // write to the source: the clone must not move
    Seq(Event(20, "w", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, src, user, UpdateMessage("v3"))
    reader.read(clone).as[Event].collect().map(_.id).sorted shouldBe Array(2L, 9L, 10L)
    reader.read(src).as[Event].collect().map(_.id).sorted shouldBe Array(1L, 3L, 20L)

    // the clone has its own time travel: its first data commit = v1 state
    val cloneStateCommit = log.updates(clone.name)
      .find(_.message.content.startsWith("clone state")).get.id
    reader.readAsOf(clone, cloneStateCommit)
      .as[Event].collect().map(_.id).sorted shouldBe Array(1L, 2L)
  }

  test("clone linkage tags pin the source state and vacuum refuses on both sides until unlink") {
    val (ctx, log) = freshContext()
    val src = partitionedTable("clone_vac")
    ctx.init(src, user, UpdateMessage("init"))
    Seq(Event(1, "a", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, src, user, UpdateMessage("v1"))
    val clone = ShallowClone.clone(spark, ctx, src, TableName("test", "clone_vac_dst"), user)

    log.refs(src.name).keys should contain("clone:test.clone_vac_dst")
    log.refs(clone.name).keys should contain("cloned-from:test.clone_vac")

    val conf = spark.sessionState.newHadoopConf()
    an[IllegalStateException] should be thrownBy Vacuum.vacuum(src, log, conf)
    an[IllegalStateException] should be thrownBy Vacuum.vacuum(clone, log, conf)

    ShallowClone.unlink(log, src.name, clone.name)
    noException should be thrownBy Vacuum.vacuum(src, log, conf, graceMs = 0)
  }

  test("clone refuses on live deletion vectors, active column mapping, and constraints") {
    val (ctx, log) = freshContext()
    val src = partitionedTable("clone_guard")
    ctx.init(src, user, UpdateMessage("init"))
    Seq(Event(1, "a", "2024-01-01"), Event(2, "b", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, src, user, UpdateMessage("v1"))

    // live DV: a merge-on-read delete anchors a sidecar to src's history
    DeletionVectors.delete(
      ctx, log, src, org.apache.spark.sql.functions.col("id") === 1,
      user, UpdateMessage("dv delete"))
    val e1 = intercept[IllegalArgumentException](
      ShallowClone.clone(spark, ctx, src, TableName("test", "g1"), user))
    e1.getMessage should include("deletion vectors")

    // constraints are location-global metadata
    val (ctx2, _) = freshContext()
    val src2 = partitionedTable("clone_guard2")
    ctx2.init(src2, user, UpdateMessage("init"))
    Seq(Event(1, "a", "2024-01-01"))
      .toDS().versionedInsertInto(ctx2, src2, user, UpdateMessage("v1"))
    Constraints.add(spark, ctx2, src2, Constraints.notNull("kind"), user)
    val e2 = intercept[IllegalArgumentException](
      ShallowClone.clone(spark, ctx2, src2, TableName("test", "g2"), user))
    e2.getMessage should include("constraints")

    // active column mapping anchors to src's commits
    val (ctx3, log3) = freshContext()
    val src3 = partitionedTable("clone_guard3")
    ctx3.init(src3, user, UpdateMessage("init"))
    Seq(Event(1, "a", "2024-01-01"))
      .toDS().versionedInsertInto(ctx3, src3, user, UpdateMessage("v1"))
    ColumnMapping.rename(spark, ctx3, src3, "kind", "category", user)
    val e3 = intercept[IllegalArgumentException](
      ShallowClone.clone(spark, ctx3, src3, TableName("test", "g3"), user))
    e3.getMessage should include("column mapping")
    log3.refs(src3.name) shouldBe empty // no half-made linkage on refusal
  }

  test("SQL: CREATE TABLE ... SHALLOW CLONE ... VERSION AS OF forks and reads through the catalog") {
    val (ctx, log) = freshContext()
    GraftTableCatalog.bind("graftclone", log)
    spark.conf.set(
      "spark.sql.catalog.graftclone", classOf[GraftTableCatalog].getName)
    try {
      val src = partitionedTable("clone_sql_src")
      ctx.init(src, user, UpdateMessage("init"))
      Seq(Event(1, "a", "2024-01-01"), Event(2, "b", "2024-01-02"))
        .toDS().versionedInsertInto(ctx, src, user, UpdateMessage("v1"))
      val v1 = log.currentCommit(src.name)
      Seq(Event(3, "c", "2024-01-03"))
        .toDS().versionedInsertInto(ctx, src, user, UpdateMessage("v2"))
      GraftTableCatalog.register("graftclone", src)

      spark.sql(
        s"""CREATE TABLE graftclone.test.clone_sql_dst SHALLOW CLONE
           |graftclone.test.clone_sql_src VERSION AS OF '${v1.id}'""".stripMargin)
        .collect().map(_.getString(0)) shouldBe Array("graftclone.test.clone_sql_dst")

      spark.sql("SELECT id FROM graftclone.test.clone_sql_dst ORDER BY id")
        .as[Long].collect() shouldBe Array(1L, 2L)
      spark.sql("SELECT id FROM graftclone.test.clone_sql_src ORDER BY id")
        .as[Long].collect() shouldBe Array(1L, 2L, 3L)

      // cloning onto an existing table refuses
      an[Exception] should be thrownBy spark.sql(
        "CREATE TABLE graftclone.test.clone_sql_dst SHALLOW CLONE graftclone.test.clone_sql_src")
    } finally {
      spark.conf.unset("spark.sql.catalog.graftclone")
    }
  }
}
