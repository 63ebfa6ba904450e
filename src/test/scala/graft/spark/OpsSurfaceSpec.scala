package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** The round-13 operator-facing polish: VACUUM DRY RUN and
  * DESCRIBE DETAIL. */
class OpsSurfaceSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("ops-test")

  test("VACUUM DRY RUN reports the reclaim set without deleting; the real run deletes it") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    spark.conf.set("spark.sql.catalog.graftops1", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("graftops1", log)
    val t = TableDefinition(
      TableName("db", "vac"),
      Files.createTempDirectory("graft_ops_vac").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftops1", t)
    (1 to 4).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "tag")
        .versionedInsertInto(ctx, t, user, UpdateMessage(s"v$i"))
    }

    val dry = spark.sql(
      "VACUUM graftops1.db.vac RETAIN 1 COMMITS GRACE 0 MINUTES DRY RUN").collect().head
    dry.getBoolean(3) shouldBe true
    val wouldDelete = dry.getInt(1)
    wouldDelete should be > 0
    // nothing was touched: every version dir still on disk, all states readable
    val reader = VersionedReader(spark, log)
    reader.read(t).count() shouldBe 1L
    val v1 = log.updates(t.name).reverse(1).id
    reader.readAsOf(t, v1).count() shouldBe 1L // oldest state still served

    val real = spark.sql(
      "VACUUM graftops1.db.vac RETAIN 1 COMMITS GRACE 0 MINUTES").collect().head
    real.getBoolean(3) shouldBe false
    real.getInt(1) shouldBe wouldDelete // the dry run predicted exactly this
    reader.read(t).count() shouldBe 1L  // current state untouched
  }

  test("identity high-water mark survives a log restart and rolls back with RESTORE") {
    val dir = Files.createTempDirectory("graft_ops_ident")
    val log = graft.core.JsonFileTableVersions(dir.toString)
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val t = TableDefinition(
      TableName("db", "ident"),
      Files.createTempDirectory("graft_ops_ident_t").toUri,
      PartitionSchema(List(PartitionColumn("grp"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    IdentityColumns.insertWithIdentity(
      (1L to 5L).map(i => (i, "a")).toDF("v", "grp"), ctx, t, "row_id",
      user, UpdateMessage("b1"))
    val afterB1 = log.currentCommit(t.name)
    val hwm1 = IdentityColumns.currentHighWaterMark(log, t.name, "row_id")
    hwm1 should be > 0L

    // restart: a fresh log instance over the same dir sees the same mark
    val reopened = graft.core.JsonFileTableVersions(dir.toString)
    IdentityColumns.currentHighWaterMark(reopened, t.name, "row_id") shouldBe hwm1
    val ctx2 = VersionContext(VersionedMetastore(reopened, new InMemoryMetastore))
    ctx2.init(t, user, UpdateMessage("reattach")) // idempotent; registers the catalog mirror
    IdentityColumns.insertWithIdentity(
      (6L to 8L).map(i => (i, "b")).toDF("v", "grp"), ctx2, t, "row_id",
      user, UpdateMessage("b2"))
    IdentityColumns.currentHighWaterMark(reopened, t.name, "row_id") should be > hwm1
    // ids across the restart stay disjoint
    val reader = VersionedReader(spark, reopened)
    val ids = reader.read(t).select("row_id").as[Long].collect()
    ids.distinct.length shouldBe 8

    // RESTORE rolls the sequence back WITH the data it rolled back (the
    // fold's resurrect quirk revives both together on the next commit)
    reopened.setCurrentVersion(t.name, afterB1)
    IdentityColumns.currentHighWaterMark(reopened, t.name, "row_id") shouldBe hwm1
  }

  test("DESCRIBE DETAIL summarizes state, inventory, and live metadata features") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    spark.conf.set("spark.sql.catalog.graftops2", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("graftops2", log)
    val t = TableDefinition(
      TableName("db", "det"),
      Files.createTempDirectory("graft_ops_det").toUri,
      PartitionSchema(List(PartitionColumn("grp"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftops2", t)
    Constraints.add(spark, ctx, t, Constraints.notNull("id"), user)
    Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("id", "grp")
      .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))

    val d = spark.sql("DESCRIBE DETAIL graftops2.db.det").collect().head
    d.getString(0) shouldBe "parquet"
    d.getString(2) shouldBe "grp"
    d.getInt(3) shouldBe 2 // partitions a, b
    d.getInt(4) should be > 0 // files
    d.getLong(5) should be > 0L // bytes
    d.getInt(6) shouldBe 3 // init + constraint audit + v1
    d.getString(7) shouldBe log.currentCommit(t.name).id
    d.getInt(8) shouldBe 1 // the NOT NULL constraint
    d.getInt(9) shouldBe 0
    d.getBoolean(10) shouldBe false
    d.getBoolean(11) shouldBe false
    // round-16 diagnosis fields: era-correct scheme, era count, tracking,
    // live DVs
    d.getString(12) shouldBe "grp"
    d.getInt(13) shouldBe 1
    d.getString(14) shouldBe ""
    d.getBoolean(15) shouldBe false

    // the fields flip with the state: a metadata-only evolution + a DV
    // delete show up as a mixed fold with live vectors
    spark.sql("ALTER TABLE graftops2.db.det SET PARTITIONED BY (id) METADATA ONLY")
    Seq((9L, "c")).toDF("id", "grp")
      .versionedInsertInto(ctx,
        t.copy(partitionSchema = PartitionSchema(List(PartitionColumn("id")))),
        user, UpdateMessage("v2"))
    DeletionVectors.delete(ctx, log, t.copy(
        partitionSchema = PartitionSchema(List(PartitionColumn("id")))),
      org.apache.spark.sql.functions.col("id") === 2L, user, UpdateMessage("dv"))
    val d2 = spark.sql("DESCRIBE DETAIL graftops2.db.det").collect().head
    d2.getString(12) shouldBe "id"
    d2.getInt(13) shouldBe 2
    d2.getBoolean(15) shouldBe true
  }

  test("identity hwm is the max id ACTUALLY assigned — ground truth from the staged output") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val t = TableDefinition(
      TableName("db", "ident_hwm"),
      Files.createTempDirectory("graft_ops_ident_hwm").toUri,
      PartitionSchema(List(PartitionColumn("grp"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    // a multi-partition source: the write job's planned partition count is
    // the engine's business — the recorded advance must equal max(row_id)
    // whatever layout the job picked
    IdentityColumns.insertWithIdentity(
      (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("v", "grp")
        .repartition(7),
      ctx, t, "row_id", user, UpdateMessage("b1"))
    val reader = VersionedReader(spark, log)
    val ids1 = reader.read(t).select("row_id").as[Long].collect()
    ids1.distinct.length shouldBe 100
    IdentityColumns.currentHighWaterMark(log, t.name, "row_id") shouldBe ids1.max

    // the next batch starts strictly above — no collision whatever the
    // previous job's partitioning was
    IdentityColumns.insertWithIdentity(
      (101L to 130L).map(i => (i, "c")).toDF("v", "grp").repartition(3),
      ctx, t, "row_id", user, UpdateMessage("b2"))
    val all = reader.read(t).select("row_id").as[Long].collect()
    all.distinct.length shouldBe 130
    IdentityColumns.currentHighWaterMark(log, t.name, "row_id") shouldBe all.max
  }

  test("SQL identity: GENERATED ALWAYS AS IDENTITY declares; INSERTs stamp unique, batch-monotone ids") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    spark.conf.set("spark.sql.catalog.graftops3", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("graftops3", log)
    val t = TableDefinition(
      TableName("db", "idsql"),
      Files.createTempDirectory("graft_ops_idsql").toUri,
      PartitionSchema(List(PartitionColumn("grp"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftops3", t, Some(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("grp", org.apache.spark.sql.types.StringType)))))

    val decl = spark.sql(
      "ALTER TABLE graftops3.db.idsql ADD COLUMN row_id BIGINT GENERATED ALWAYS AS IDENTITY")
      .collect()
    decl.head.getString(1) should include("identity")

    spark.sql("INSERT INTO graftops3.db.idsql (v, grp) VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    spark.sql("INSERT INTO graftops3.db.idsql (v, grp) VALUES (4, 'c'), (5, 'c')")

    val rows = spark.sql("SELECT v, row_id FROM graftops3.db.idsql")
      .as[(Long, Long)].collect()
    rows.length shouldBe 5
    rows.map(_._2).distinct.length shouldBe 5 // all non-null, all unique
    val b1max = rows.filter(_._1 <= 3).map(_._2).max
    val b2min = rows.filter(_._1 >= 4).map(_._2).min
    b2min should be > b1max // batch 2 starts above batch 1's high-water mark

    // GENERATED ALWAYS: supplying a value rejects
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graftops3.db.idsql (v, grp, row_id) VALUES (9, 'z', 42)")
    }
    e.getMessage should include("ALWAYS")
    spark.sql("SELECT count(*) FROM graftops3.db.idsql").head.getLong(0) shouldBe 5L

    // a second identity column rejects; BIGINT is required
    intercept[Exception] {
      spark.sql("ALTER TABLE graftops3.db.idsql ADD COLUMN id2 BIGINT GENERATED ALWAYS AS IDENTITY")
    }.getMessage should include("already has identity column")
  }
}

/** SQL multi-table transactions ([[GraftTxn]]) × the rest of the write
  * discipline: staged writes run the FULL pre-write pipeline (a
  * constraint-violating stage fails at STAGE time, before anything could
  * commit), statement ordering is enforced, and a second BEGIN refuses. */
class SqlTxnDisciplineSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._
  private val user = UserId("txn-test")

  test("STAGE INSERT enforces constraints at stage time; protocol misuse refuses loudly") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    spark.conf.set("spark.sql.catalog.grafttxn1", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("grafttxn1", log)
    val t = TableDefinition(
      TableName("db", "txn_con"),
      java.nio.file.Files.createTempDirectory("graft_txn_con").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    import VersionContext.DatasetVersionOps
    Seq(Event(1L, "a", "2024-01-01")).toDS()
      .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    GraftTableCatalog.register("grafttxn1", t)
    Constraints.add(spark, ctx, t, Constraints.check("pos", "id > 0"), user)

    // protocol misuse: stage/commit/rollback without an open txn refuse
    intercept[Exception](spark.sql(
      "STAGE INSERT INTO grafttxn1.db.txn_con SELECT 2L AS id, 'b' AS kind, '2024-01-01' AS date"))
      .getMessage should include("no open graft transaction")
    intercept[Exception](spark.sql("COMMIT GRAFT TRANSACTION"))
      .getMessage should include("no open graft transaction")
    intercept[Exception](spark.sql("ROLLBACK GRAFT TRANSACTION"))
      .getMessage should include("no open graft transaction")

    spark.sql("BEGIN GRAFT TRANSACTION")
    // a second BEGIN on the same session refuses
    intercept[Exception](spark.sql("BEGIN GRAFT TRANSACTION"))
      .getMessage should include("already open")
    // the staged write runs NOW — a constraint violation fails the STAGE
    // statement itself, and the buffer keeps working afterwards
    intercept[Exception](spark.sql(
      "STAGE INSERT INTO grafttxn1.db.txn_con SELECT -5L AS id, 'x' AS kind, '2024-01-01' AS date"))
    val head = log.currentCommit(t.name)
    spark.sql(
      "STAGE INSERT INTO grafttxn1.db.txn_con SELECT 2L AS id, 'b' AS kind, '2024-01-01' AS date")
    log.currentCommit(t.name) shouldBe head // staged, not committed
    // a second stage touching the SAME partition refuses (it cannot see
    // the first stage's uncommitted rows)
    intercept[Exception](spark.sql(
      "STAGE INSERT INTO grafttxn1.db.txn_con SELECT 3L AS id, 'c' AS kind, '2024-01-01' AS date"))
      .getMessage should include("same partitions")
    spark.sql("COMMIT GRAFT TRANSACTION")
    log.currentCommit(t.name) should not be head
    // INTO appends: the carried v1 row AND the staged row both serve
    spark.table("grafttxn1.db.txn_con").count() shouldBe 2L
    // OVERWRITE replaces the touched partition
    spark.sql("BEGIN GRAFT TRANSACTION")
    spark.sql(
      "STAGE INSERT OVERWRITE grafttxn1.db.txn_con SELECT 9L AS id, 'z' AS kind, '2024-01-01' AS date")
    spark.sql("COMMIT GRAFT TRANSACTION")
    spark.table("grafttxn1.db.txn_con").select("id").as[Long].collect() shouldBe Array(9L)
    // an empty transaction refuses to commit (junk-entry guard)
    spark.sql("BEGIN GRAFT TRANSACTION")
    intercept[Exception](spark.sql("COMMIT GRAFT TRANSACTION"))
      .getMessage should include("staged nothing")
    // the failed commit popped the buffer; a fresh BEGIN works
    spark.sql("BEGIN GRAFT TRANSACTION")
    spark.sql("ROLLBACK GRAFT TRANSACTION")
  }

  test("merge-on-read REPLACE WHERE composes with time travel: the pre-overwrite commit reads the old region") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    spark.conf.set("spark.sql.catalog.grafttxn2", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("grafttxn2", log)
    val t = TableDefinition(
      TableName("db", "morrw_tt"),
      java.nio.file.Files.createTempDirectory("graft_morrw_tt").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    import VersionContext.DatasetVersionOps
    (1L to 10L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    GraftTableCatalog.register("grafttxn2", t)
    val pre = log.currentCommit(t.name)
    spark.conf.set("spark.graft.dml.mergeOnRead", "true")
    try spark.sql(
      "INSERT INTO grafttxn2.db.morrw_tt REPLACE WHERE kind = 'even' " +
        "SELECT 100L AS id, 'even' AS kind, '2024-01-01' AS date")
    finally spark.conf.unset("spark.graft.dml.mergeOnRead")
    // current: evens replaced by the single incoming row
    val cur = spark.table("grafttxn2.db.morrw_tt")
    cur.count() shouldBe 6L
    cur.where($"kind" === "even").select("id").as[Long].collect() shouldBe Array(100L)
    // time travel: the pre-overwrite commit reads the ORIGINAL region
    // (the at-or-before sidecar discipline — vectors and overlay rows
    // anchored after `pre` are invisible there)
    val old = spark.sql(
      s"SELECT * FROM grafttxn2.db.morrw_tt VERSION AS OF '${pre.id}'")
    old.count() shouldBe 10L
    old.where($"kind" === "even").count() shouldBe 5L
  }
}
