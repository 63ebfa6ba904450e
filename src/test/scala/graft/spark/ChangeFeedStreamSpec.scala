package graft.spark

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

class ChangeFeedStreamSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("cfs-test")

  private def freshTable(name: String): (TableDefinition, TableVersions, VersionContext) = {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", name),
      Files.createTempDirectory(s"graft_spec_$name").toUri,
      PartitionSchema(List(PartitionColumn("grp"))),
      FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    (table, log, ctx)
  }

  test("change-feed stream: DV deletes and rewrites stream as typed rows; a replaying consumer converges") {
    val (table, log, ctx) = freshTable("cfs_converge")
    Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    val checkpoint = Files.createTempDirectory("graft_cfs_ckpt").toString
    // the consumer maintains a COPY by replaying each typed batch — the
    // merge-sink/materialized-view shape that silently diverged before
    // the feed could say "delete"
    val copy = new java.util.concurrent.ConcurrentHashMap[(Long, String), Int]()
    def apply(rows: Seq[(String, Long, String)]): Unit = rows.foreach {
      case (tpe, k, grp) =>
        val key = (k, grp)
        val delta = if (tpe == ChangeFeed.Insert) 1 else -1
        copy.merge(key, delta, (a, b) => a + b); ()
    }
    val q = VersionedStream.readChangeFeed(spark, log, table)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        apply(b.select(col(ChangeFeed.ChangeTypeCol), col("k"), col("grp"))
          .as[(String, Long, String)].collect().toSeq)
      }
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      q.processAllAvailable()
      copy.asScala.filter(_._2 > 0).keys.map(_._1).toSeq.sorted shouldBe Seq(1L, 2L, 3L, 4L, 5L)

      // a DV delete in partition a — no pointer moves, yet the feed says so
      DeletionVectors.delete(
        ctx, log, table, col("k") === 2L, user, UpdateMessage("dv")) shouldBe 1L
      q.processAllAvailable()
      copy.asScala.filter(_._2 > 0).keys.map(_._1).toSeq.sorted shouldBe Seq(1L, 3L, 4L, 5L)

      // a partition rewrite streams as delete(old b) + insert(new b)
      Seq((30L, "b")).toDF("k", "grp")
        .versionedInsertInto(ctx, table, user, UpdateMessage("v2: refresh b"))
      q.processAllAvailable()
      copy.asScala.filter(_._2 > 0).keys.map(_._1).toSeq.sorted shouldBe Seq(1L, 5L, 30L)

      // convergence: the copy equals the source's DV-applied current state
      val src = DeletionVectors.read(spark, log, table)
        .select("k", "grp").as[(Long, String)].collect().toSet
      copy.asScala.filter(_._2 > 0).keys.toSet shouldBe src

      // staged feed dirs are pruned once their batches commit
      val feedRoot = new java.io.File(checkpoint, "graft-cdc-feed")
      (!feedRoot.exists() || feedRoot.listFiles().isEmpty) shouldBe true
    } finally q.stop()
  }

  test("append-only ranges keep the zero-copy path and still tag rows insert") {
    val (table, log, ctx) = freshTable("cfs_append")
    Seq((1L, "a")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val checkpoint = Files.createTempDirectory("graft_cfs_app_ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val q = VersionedStream.readChangeFeed(spark, log, table)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col(ChangeFeed.ChangeTypeCol), col("k"))
          .as[(String, Long)].collect().foreach(got.add); ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      q.processAllAvailable()
      Seq((2L, "b")).toDF("k", "grp")
        .versionedInsertInto(ctx, table, user, UpdateMessage("v2: new partition"))
      q.processAllAvailable()
      got.asScala.toList.sortBy(_._2) shouldBe List(
        (ChangeFeed.Insert, 1L), (ChangeFeed.Insert, 2L))
      // nothing was staged: both ranges were pure appends
      new java.io.File(checkpoint, "graft-cdc-feed").exists() shouldBe false
    } finally q.stop()
  }

  test("the insert-only stream refuses a DV range loudly instead of diverging") {
    val (table, log, ctx) = freshTable("cfs_refuse")
    Seq((1L, "a"), (2L, "a")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val sink = s"cfs_refuse_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = VersionedStream.readStream(spark, log, table)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      q.processAllAvailable()
      DeletionVectors.delete(
        ctx, log, table, col("k") === 1L, user, UpdateMessage("dv")) shouldBe 1L
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(2000)
      }
      ex.getMessage should include("readChangeFeed")
    } finally q.stop()
  }
}
