package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.max
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.{TestSpark, VersionContext, VersionedReader}
import graft.spark.VersionContext.DatasetVersionOps

case class Tick(ts: Timestamp, event_type: String, user_id: Long, value: Double)

class StreamsSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private def t(sec: Int) = Timestamp.valueOf(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")

  test("tumbling windows aggregate a memory stream under a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val q = Streams.tumblingCounts(input.toDF(), "ts", "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("tumbling").outputMode("complete").start()
    try {
      input.addData(
        Tick(t(5), "click", 1, 1.0), Tick(t(20), "click", 2, 2.0),
        Tick(t(65), "view", 1, 3.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select("event_type", "n_events", "sum_value").as[(String, Long, Double)]
        .collect().sortBy(_._1)
      rows shouldBe Array(("click", 2L, 3.0), ("view", 1L, 3.0))
    } finally q.stop()
  }

  test("session windows close after the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val q = Streams.sessionized(input.toDF(), "ts", "30 seconds", "10 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    try {
      // user 1: two bursts separated by > 30s -> two sessions
      input.addData(
        Tick(t(0), "click", 1, 1.0), Tick(t(10), "click", 1, 1.0),
        Tick(t(120), "click", 1, 1.0))
      q.processAllAvailable()
      spark.table("sessions").where($"user_id" === 1).count() shouldBe 2
    } finally q.stop()
  }

  test("staticEnrich decorates a stream with broadcast dimension attributes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("d_user", "tier")
    val q = Streams.staticEnrich(input.toDF(), dim, "user_id", "d_user")
      .select("user_id", "tier", "value")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      input.addData(
        Tick(t(0), "click", 1, 1.0), Tick(t(1), "view", 2, 2.0),
        Tick(t(2), "click", 9, 4.0)) // user 9 has no dim row -> dropped (inner)
      q.processAllAvailable()
      spark.table("enriched").as[(Long, String, Double)].collect().sortBy(_._1) shouldBe
        Array((1L, "GOLD", 1.0), (2L, "SILVER", 2.0))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replayed events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val deduped = Streams.dedupWithinWatermark(input.toDF(), "ts", "10 minutes", Seq("user_id", "ts"))
    val q = deduped.writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(Tick(t(1), "click", 1, 1.0), Tick(t(1), "click", 1, 1.0))
      q.processAllAvailable()
      input.addData(Tick(t(1), "click", 1, 1.0)) // replay in a later batch
      q.processAllAvailable()
      spark.table("dedup").count() shouldBe 1
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user totals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val q = Streams.runningUserTotals(input.toDS())
      .toDF("user_id", "n", "total")
      .writeStream.format("memory").queryName("running").outputMode("update").start()
    try {
      input.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      input.addData((1L, 5.0)) // state must carry the previous count/sum
      q.processAllAvailable()
      val last = spark.table("running")
        .groupBy("user_id").agg(max("n").as("n"), max("total").as("total"))
        .as[(Long, Long, Double)].collect().sortBy(_._1)
      last shouldBe Array((1L, 3L, 10.0), (2L, 1L, 10.0))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits exactly one alert when a user's total crosses the threshold") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val q = Streams.thresholdAlerts(input.toDS(), threshold = 100.0)
      .toDF("user_id", "total")
      .writeStream.format("memory").queryName("alerts").outputMode("append").start()
    try {
      input.addData((1L, 60.0), (2L, 10.0))
      q.processAllAvailable()
      spark.table("alerts").count() shouldBe 0 // nobody crossed yet
      input.addData((1L, 50.0)) // user 1 crosses (110)
      q.processAllAvailable()
      input.addData((1L, 500.0)) // already alerted — no second emission
      q.processAllAvailable()
      val alerts = spark.table("alerts").as[(Long, Double)].collect()
      alerts shouldBe Array((1L, 110.0))
    } finally q.stop()
  }

  test("versioned sink commits one table version per micro-batch and reads back") {
    implicit val sqlCtx = spark.sqlContext
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "stream_sink"),
      Files.createTempDirectory("graft_stream_sink").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(table, UserId("stream"), UpdateMessage("init"))

    val input = MemoryStream[Tick]
    val q = Streams.versionedSink(input.toDS(), ctx, table, UserId("stream"))
      .option("checkpointLocation", Files.createTempDirectory("graft_stream_ckpt").toString)
      .start()
    try {
      input.addData(Tick(t(1), "click", 1, 1.0))
      q.processAllAvailable()
      input.addData(Tick(t(2), "view", 2, 2.0))
      q.processAllAvailable()

      // snapshot semantics: each micro-batch is a full new version
      val history = log.updates(table.name).map(_.message.content)
      history.count(_.startsWith("micro-batch")) shouldBe 2
      VersionedReader(spark, log).read(table).as[Tick].collect()
        .map(_.event_type) shouldBe Array("view")
    } finally q.stop()
  }

  test("a NEW query with a fresh checkpoint is not shadowed by an old query's batch ids") {
    implicit val sqlCtx = spark.sqlContext
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "stream_fresh_ckpt"),
      Files.createTempDirectory("graft_stream_fresh").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(table, UserId("stream"), UpdateMessage("init"))

    // query 1 advances the table to batch ids 0 and 1 under ITS identity
    val in1 = MemoryStream[Tick]
    val q1 = Streams.versionedSink(in1.toDS(), ctx, table, UserId("stream"))
      .option("checkpointLocation", Files.createTempDirectory("graft_fresh_c1").toString)
      .start()
    try {
      in1.addData(Tick(t(1), "click", 1, 1.0)); q1.processAllAvailable()
      in1.addData(Tick(t(2), "view", 2, 2.0)); q1.processAllAvailable()
    } finally q1.stop()
    val afterQ1 = log.updates(table.name).count(_.message.content.startsWith("micro-batch"))
    afterQ1 shouldBe 2

    // a brand-NEW query (fresh checkpoint → batch ids restart at 0) must
    // COMMIT its batches, not silently skip them below the old high-water
    // mark — the default txn identity is per-query, not per-table
    val in2 = MemoryStream[Tick]
    val q2 = Streams.versionedSink(in2.toDS(), ctx, table, UserId("stream"))
      .option("checkpointLocation", Files.createTempDirectory("graft_fresh_c2").toString)
      .start()
    try {
      in2.addData(Tick(t(3), "buy", 3, 3.0)); q2.processAllAvailable()
    } finally q2.stop()
    log.updates(table.name)
      .count(_.message.content.startsWith("micro-batch")) shouldBe afterQ1 + 1
    VersionedReader(spark, log).read(table).as[Tick].collect()
      .map(_.event_type) shouldBe Array("buy")
  }

  test("sink replay after crash-between-commit-and-checkpoint commits exactly once per batch id") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "stream_replay"),
      Files.createTempDirectory("graft_stream_replay").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(table, UserId("stream"), UpdateMessage("init"))
    val appId = "stream:test.stream_replay"

    val b0 = Seq(Tick(t(1), "click", 1, 1.0)).toDS()
    Streams.applyVersionedBatch(b0, 0L, ctx, table, UserId("stream"), appId)
    log.updates(table.name).count(_.message.content.startsWith("micro-batch")) shouldBe 1

    // the engine re-delivers batch 0 after recovery (commit landed, the
    // streaming checkpoint didn't): the txn marker must suppress a second
    // commit — identical content AND identical history
    Streams.applyVersionedBatch(b0, 0L, ctx, table, UserId("stream"), appId)
    log.updates(table.name).count(_.message.content.startsWith("micro-batch")) shouldBe 1
    log.lastTxnBatch(table.name, appId) shouldBe Some(0L)

    // the next genuine batch commits normally
    Streams.applyVersionedBatch(
      Seq(Tick(t(2), "view", 2, 2.0)).toDS(), 1L, ctx, table, UserId("stream"), appId)
    log.updates(table.name).count(_.message.content.startsWith("micro-batch")) shouldBe 2
    log.lastTxnBatch(table.name, appId) shouldBe Some(1L)

    // a DIFFERENT writer identity is not shadowed by this one's batch ids
    Streams.applyVersionedBatch(
      Seq(Tick(t(3), "buy", 3, 3.0)).toDS(), 0L, ctx, table, UserId("stream"), "other-app")
    log.updates(table.name).count(_.message.content.startsWith("micro-batch")) shouldBe 3

    // merge-sink path shares the same replay guard
    val mtable = TableDefinition(
      TableName("test", "stream_replay_merge"),
      Files.createTempDirectory("graft_stream_replay_m").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(mtable, UserId("stream"), UpdateMessage("init"))
    Seq(Tick(t(1), "seed", 1, 1.0)).toDS()
      .versionedInsertInto(ctx, mtable, UserId("stream"), UpdateMessage("v1"))
    val mb = Seq(Tick(t(2), "upd", 1, 9.0)).toDS()
    Streams.applyMergeBatch(mb, 0L, ctx, log, mtable, Seq("user_id"), UserId("stream"), "m-app")
    Streams.applyMergeBatch(mb, 0L, ctx, log, mtable, Seq("user_id"), UserId("stream"), "m-app")
    log.updates(mtable.name).count(_.message.content.startsWith("merge micro-batch")) shouldBe 1
    VersionedReader(spark, log).read(mtable).as[Tick].collect().map(_.value) shouldBe Array(9.0)
  }

  test("upsert sink applies keyed changes merge-on-read: zero pointer moves, exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    import graft.spark.Event
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "stream_upsert"),
      Files.createTempDirectory("graft_stream_upsert").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    val user = UserId("stream")
    ctx.init(table, user, UpdateMessage("init"))
    (1L to 10L).map(i => Event(i, "base", s"2024-01-0${i % 2 + 1}"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("preload"))
    val foldBefore = log.currentVersion(table.name)

    val input = MemoryStream[Event]
    val q = Streams.upsertSink(
      input.toDS(), ctx, log, table, Seq("id"), user, txnAppId = Some("ups"))
      .option("checkpointLocation", Files.createTempDirectory("graft_ups_ckpt").toString)
      .start()
    try {
      // batch 0: one update (key 3), one insert (key 100, existing partition)
      input.addData(Event(3L, "u3", "2024-01-02"), Event(100L, "new", "2024-01-01"))
      q.processAllAvailable()
      // batch 1: re-update key 3, update key 8
      input.addData(Event(3L, "u3b", "2024-01-02"), Event(8L, "u8", "2024-01-01"))
      q.processAllAvailable()
    } finally q.stop()

    // merge-on-read: NO partition pointer ever moves
    log.currentVersion(table.name) shouldBe foldBefore
    val rows = graft.spark.DeletionVectors.read(spark, log, table)
    rows.count() shouldBe 11L
    rows.where($"id" === 3L).select("kind").as[String].collect() shouldBe Array("u3b")
    rows.where($"id" === 8L).select("kind").as[String].collect() shouldBe Array("u8")
    rows.where($"id" === 100L).count() shouldBe 1L

    // replaying an already-committed batch id is a no-op
    val commits = log.updates(table.name).size
    Streams.applyUpsertBatch(
      Seq(Event(3L, "ghost", "2024-01-02")).toDS(), 1L,
      ctx, log, table, Seq("id"), user, "ups")
    log.updates(table.name).size shouldBe commits
    graft.spark.DeletionVectors.read(spark, log, table)
      .where($"id" === 3L).select("kind").as[String].collect() shouldBe Array("u3b")
  }

  test("txn markers round-trip the durable JSON log") {
    val dir = Files.createTempDirectory("graft_txn_json")
    val log = new JsonFileTableVersions(dir)
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "txn_durable"),
      Files.createTempDirectory("graft_txn_durable").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(table, UserId("stream"), UpdateMessage("init"))
    Streams.applyVersionedBatch(
      Seq(Tick(t(1), "click", 1, 1.0)).toDS(), 7L, ctx, table, UserId("stream"), "app-x")

    // a RE-OPENED log (fresh process after a crash) must still see the marker
    val reopened = new JsonFileTableVersions(dir)
    reopened.lastTxnBatch(table.name, "app-x") shouldBe Some(7L)
    val ctx2 = VersionContext(VersionedMetastore(reopened, new InMemoryMetastore))
    Streams.applyVersionedBatch(
      Seq(Tick(t(1), "click", 1, 1.0)).toDS(), 7L, ctx2, table, UserId("stream"), "app-x")
    reopened.updates(table.name).count(_.message.content.startsWith("micro-batch")) shouldBe 1
  }
}
