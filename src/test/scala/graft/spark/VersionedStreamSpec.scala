package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

class VersionedStreamSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("cdc-test")

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

  test("the CDC stream replays committed history, then follows new commits incrementally") {
    val (table, log, ctx) = freshTable("cdc_follow")
    Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: a+b"))
    Seq((4L, "c")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2: c"))

    val sink = s"cdc_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = VersionedStream.readStream(spark, log, table)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      q.processAllAvailable()
      // backfill: both commits' partitions streamed exactly once
      spark.table(sink).select("k").as[Long].collect().sorted shouldBe Array(1L, 2L, 3L, 4L)

      // a third commit rewrites ONLY partition b: the next batch carries
      // exactly that partition's new contents
      Seq((30L, "b"), (31L, "b")).toDF("k", "grp")
        .versionedInsertInto(ctx, table, user, UpdateMessage("v3: refresh b"))
      q.processAllAvailable()
      spark.table(sink).select("k").as[Long].collect().sorted shouldBe
        Array(1L, 2L, 3L, 4L, 30L, 31L)

      // partition columns are recovered from the k=v dirs
      spark.table(sink).where($"grp" === "b").count() shouldBe 3L
    } finally q.stop()
  }

  test("startingCommit skips history: a fresh stream emits only post-anchor changes") {
    val (table, log, ctx) = freshTable("cdc_starting")
    Seq((1L, "a"), (2L, "b")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)
    Seq((3L, "c")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2"))
    val v2At = log.updates(table.name).head.timestamp
    Seq((4L, "d")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v3"))

    // startingAt = v1: the consumer already holds v1's state (a batch
    // backfill) — the stream must NOT replay the 100 TB history, only the
    // post-anchor commits
    val sink = s"cdc_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = VersionedStream.readStream(spark, log, table, startingAt = Some(v1))
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table(sink).select("k").as[Long].collect().sorted shouldBe Array(3L, 4L)
      // and it keeps following new commits
      Seq((5L, "e")).toDF("k", "grp")
        .versionedInsertInto(ctx, table, user, UpdateMessage("v4"))
      q.processAllAvailable()
      spark.table(sink).select("k").as[Long].collect().sorted shouldBe Array(3L, 4L, 5L)
    } finally q.stop()

    // startingTimestamp: at-or-before resolution (v2's instant names v2)
    val sink2 = s"cdc_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val h = java.util.UUID.randomUUID().toString
    VersionedStream.handles.put(h, VersionedStream.Handle(log, table))
    val q2 = spark.readStream
      .format(classOf[GraftCdcProvider].getName)
      .option("handle", h)
      .option("startingTimestamp", v2At.toString)
      .load()
      .writeStream.format("memory").queryName(sink2).outputMode("append").start()
    try {
      q2.processAllAvailable()
      spark.table(sink2).select("k").as[Long].collect().sorted shouldBe Array(4L, 5L)
    } finally q2.stop()

    // an unknown anchor refuses loudly instead of replaying from zero
    val q3 = VersionedStream.readStream(
      spark, log, table, startingAt = Some(TableVersions.CommitId("no-such-commit")))
      .writeStream.format("memory")
      .queryName(s"cdc_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}")
      .outputMode("append").start()
    try {
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      ex.getMessage should include("startingCommit")
    } finally q3.stop()
  }

  test("readStream.table streams a catalog-named table without a handle (net contents)") {
    val (table, log, ctx) = freshTable("cdc_bytable")
    spark.conf.set("spark.sql.catalog.graftstream", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("graftstream", log)
    GraftTableCatalog.register("graftstream", table)
    Seq((1L, "a"), (2L, "b")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)
    Seq((3L, "c")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2"))

    val sink = s"cdc_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.table("graftstream.test.cdc_bytable")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table(sink).select("k").as[Long].collect().sorted shouldBe Array(1L, 2L, 3L)
      // and it follows new commits
      Seq((4L, "d")).toDF("k", "grp")
        .versionedInsertInto(ctx, table, user, UpdateMessage("v3"))
      q.processAllAvailable()
      spark.table(sink).select("k").as[Long].collect().sorted shouldBe
        Array(1L, 2L, 3L, 4L)
    } finally q.stop()

    // startingCommit flows through the reader options
    val sink2 = s"cdc_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q2 = spark.readStream.option("startingCommit", v1.id)
      .table("graftstream.test.cdc_bytable")
      .writeStream.format("memory").queryName(sink2).outputMode("append").start()
    try {
      q2.processAllAvailable()
      spark.table(sink2).select("k").as[Long].collect().sorted shouldBe Array(3L, 4L)
    } finally q2.stop()

    // the feed modes need a _change_type column the fixed relation schema
    // cannot carry: refuse with the handle-API pointer
    val q3 = spark.readStream.option("changeFeed", "true")
      .table("graftstream.test.cdc_bytable")
      .writeStream.format("memory")
      .queryName(s"cdc_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}")
      .outputMode("append").start()
    try {
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      ex.getMessage should include("readChangeFeed")
    } finally q3.stop()
  }

  test("maxCommitsPerTrigger paces catch-up: one commit per micro-batch, same total rows") {
    val (table, log, ctx) = freshTable("cdc_paced")
    (1 to 4).foreach { i =>
      Seq((i.toLong, s"g$i")).toDF("k", "grp")
        .versionedInsertInto(ctx, table, user, UpdateMessage(s"v$i"))
    }
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = VersionedStream.readStream(spark, log, table, maxCommitsPerTrigger = Some(1))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = b.count(); batches.synchronized { batches += n; () }; ()
      }
      .start()
    try {
      q.processAllAvailable()
      // 4 commits → 4 paced non-empty batches of one commit each, instead
      // of one giant catch-up batch; nothing lost, nothing duplicated
      batches.synchronized {
        batches.filter(_ > 0) shouldBe Seq(1L, 1L, 1L, 1L)
      }
      // and the stream keeps following new commits under the same pacing
      Seq((9L, "g9")).toDF("k", "grp")
        .versionedInsertInto(ctx, table, user, UpdateMessage("v5"))
      q.processAllAvailable()
      batches.synchronized { batches.sum shouldBe 5L }
    } finally q.stop()
  }

  test("a restarted query resumes from its checkpoint and reads only new commits") {
    val (table, log, ctx) = freshTable("cdc_restart")
    Seq((1L, "a"), (2L, "b")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val checkpoint = Files.createTempDirectory("graft_cdc_ckpt").toString
    // the memory sink can't recover from a checkpoint; foreachBatch can —
    // it is also the sink shape the versioned pipelines actually use
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): Unit = {
      val q = VersionedStream.readStream(spark, log, table)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("k").as[Long].collect().foreach(got.add); ()
        }
        .option("checkpointLocation", checkpoint)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    import scala.jdk.CollectionConverters._
    got.asScala.toArray.sorted shouldBe Array(1L, 2L)

    // a commit lands while no query is running; the restarted query (same
    // checkpoint) must deliver exactly the new commit, not a replay
    Seq((3L, "c")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2"))
    got.clear()
    run()
    got.asScala.toArray.sorted shouldBe Array(3L)
  }

  test("offsets are commit indexes and survive serialization round-trips") {
    val (table, log, _) = freshTable("cdc_offsets")
    val stream = new GraftCdcMicroBatchStream(
      VersionedStream.Handle(log, table), null,
      org.apache.spark.sql.types.StructType(Nil))
    val initId = log.updates(table.name).head.id.id
    val off = stream.latestOffset()
    off shouldBe CommitOffset(1, Some(initId)) // the init commit
    stream.deserializeOffset(off.json()) shouldBe CommitOffset(1, Some(initId))
    stream.initialOffset() shouldBe CommitOffset(0)
    // a pre-id (legacy) checkpoint still restores, without the guard
    stream.deserializeOffset("""{"commits":1}""") shouldBe CommitOffset(1)
  }

  test("a checkpointed-away commit range fails offset restore loudly instead of remapping") {
    val logDir = Files.createTempDirectory("graft_cdc_ckpt_log")
    val log = JsonFileTableVersions(logDir.toString)
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "cdc_ckpt"),
      Files.createTempDirectory("graft_spec_cdc_ckpt").toUri,
      PartitionSchema(List(PartitionColumn("grp"))),
      FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    (1 to 4).foreach { i =>
      Seq((i.toLong, s"g$i")).toDF("k", "grp")
        .versionedInsertInto(ctx, table, user, UpdateMessage(s"v$i"))
    }
    val stream = new GraftCdcMicroBatchStream(
      VersionedStream.Handle(log, table), null,
      VersionedStream.resolveSchema(spark, VersionedStream.Handle(log, table)))
    // a live stream consumed through commit 2 of 5 (init + v1..v4)
    val consumed = stream.deserializeOffset(
      CommitOffset(2, Some(log.updates(table.name)(3).id.id)).json())
    consumed.asInstanceOf[CommitOffset].commits shouldBe 2

    // the log is checkpointed down to 2 entries: index 2 now names the
    // LAST commit — a bare index would silently skip v3/v4's changes
    log.checkpoint(table.name, keepLast = 1) shouldBe true
    log.updates(table.name).size shouldBe 2
    val boom = intercept[IllegalArgumentException](
      stream.deserializeOffset(consumed.json()))
    boom.getMessage should include("checkpointed past a live stream offset")
    // and planning with the stale offset is equally guarded
    intercept[IllegalArgumentException](
      stream.planInputPartitions(consumed, stream.latestOffset()))

    // a LEGACY (pre-id) offset past the shrunken history fails the same
    // way — the strongest check an id-less offset admits (an in-range
    // legacy index can't be verified further; documented limitation)
    val legacyBoom = intercept[IllegalArgumentException](
      stream.deserializeOffset("""{"commits":3}"""))
    legacyBoom.getMessage should include("legacy pre-id format")
    stream.deserializeOffset("""{"commits":2}""") shouldBe CommitOffset(2)
  }

  test("an offset whose commit survives a log checkpoint RE-ANCHORS by id and resumes") {
    val logDir = Files.createTempDirectory("graft_cdc_reanchor_log")
    val log = JsonFileTableVersions(logDir.toString)
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "cdc_reanchor"),
      Files.createTempDirectory("graft_spec_cdc_reanchor").toUri,
      PartitionSchema(List(PartitionColumn("grp"))),
      FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    Seq((1L, "a")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    Seq((2L, "b")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2"))

    val checkpoint = Files.createTempDirectory("graft_cdc_reanchor_ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): Unit = {
      val q = VersionedStream.readStream(spark, log, table)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("k").as[Long].collect().foreach(got.add); ()
        }
        .option("checkpointLocation", checkpoint)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // consumes init + v1 + v2
    import scala.jdk.CollectionConverters._
    got.asScala.toArray.sorted shouldBe Array(1L, 2L)

    // while no query runs: one more commit, then the log checkpoints —
    // the stream's offset id (v2's commit) SURVIVES the fold in the tail
    Seq((3L, "c")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v3"))
    log.checkpoint(table.name, keepLast = 2) shouldBe true
    log.updates(table.name).size shouldBe 3 // base + v2 + v3

    // the restarted query re-anchors to the shifted index and delivers
    // exactly the missed commit — no refusal, no replay, no skip
    got.clear()
    run()
    got.asScala.toArray.sorted shouldBe Array(3L)

    // unit level: an offset that consumed EXACTLY the folded range
    // re-anchors onto the synthetic base (which keeps that commit's id)
    val stream = new GraftCdcMicroBatchStream(
      VersionedStream.Handle(log, table), null,
      VersionedStream.resolveSchema(spark, VersionedStream.Handle(log, table)))
    val baseId = log.updates(table.name).last.id.id
    stream.deserializeOffset(s"""{"commits":1,"last":"$baseId"}""") shouldBe
      CommitOffset(1, Some(baseId))
  }

  test("an empty commit range plans zero partitions") {
    val (table, log, ctx) = freshTable("cdc_empty")
    Seq((1L, "a")).toDF("k", "grp")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val stream = new GraftCdcMicroBatchStream(
      VersionedStream.Handle(log, table), null,
      VersionedStream.resolveSchema(spark, VersionedStream.Handle(log, table)))
    stream.planInputPartitions(CommitOffset(2), CommitOffset(2)) shouldBe empty
  }
}
