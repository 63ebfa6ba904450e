package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** `INSERT INTO t REPLACE WHERE <pred> <select>` ([[ReplaceWhere]]):
  * one-commit selective overwrite. Partition-scoped predicates take the
  * zero-read dynamic-overwrite path (matched partitions resolve from the
  * fold's values); general predicates rewrite only touched partitions;
  * incoming rows outside the region refuse. */
class ReplaceWhereSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._
  private val user = UserId("rw")

  private val log = new InMemoryTableVersions
  private val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
  spark.conf.set("spark.sql.catalog.graftrw", classOf[GraftTableCatalog].getName)
  GraftTableCatalog.bind("graftrw", log)

  private def mkTable(name: String): TableDefinition = {
    val t = TableDefinition(
      TableName("db", name),
      Files.createTempDirectory(s"graft_rw_$name").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftrw", t)
    t
  }

  private def fold(t: TableDefinition): Map[Partition, Version] =
    log.currentVersion(t.name) match {
      case PartitionedTableVersion(pvs) => pvs
      case other => fail(s"unexpected fold $other")
    }

  test("partition-scoped predicate: zero-read overwrite, untouched pointers pinned") {
    val t = mkTable("rw_part")
    (1L to 30L).map(i => Event(i, "base", s"2024-01-0${i % 3 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    val before = fold(t)

    spark.sql(
      "INSERT INTO graftrw.db.rw_part REPLACE WHERE date = '2024-01-02' " +
        "SELECT id + 100 AS id, 'fresh' AS kind, '2024-01-02' AS date " +
        "FROM graftrw.db.rw_part WHERE date = '2024-01-02' AND id <= 10")
    val after = fold(t)
    val p2 = Partition(List(ColumnValue(PartitionColumn("date"), "2024-01-02")))
    // replaced partition got a NEW version; every other pointer is pinned
    after(p2) should not be before(p2)
    (after - p2) shouldBe (before - p2)
    val rows = DeletionVectors.read(spark, log, t)
    rows.where(col("date") === "2024-01-02").select("kind")
      .distinct().as[String].collect() shouldBe Array("fresh")
    // 30 rows/3 dates = 10 in the partition; ids 1,4,7,10 of the replaced
    // date were <= 10 → 4 replacement rows
    rows.where(col("date") === "2024-01-02").count() shouldBe 4L
    rows.count() shouldBe 24L
  }

  test("empty source removes the matched partition in the same commit") {
    val t = mkTable("rw_drop")
    (1L to 9L).map(i => Event(i, "x", s"2024-01-0${i % 3 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    spark.sql(
      "INSERT INTO graftrw.db.rw_drop REPLACE WHERE date = '2024-01-03' " +
        "SELECT id, kind, date FROM graftrw.db.rw_drop WHERE false")
    fold(t).keys.map(_.columnValues.head.value) should not contain "2024-01-03"
    DeletionVectors.read(spark, log, t).count() shouldBe 6L
  }

  test("general predicate: survivors carried, untouched partitions pinned") {
    val t = mkTable("rw_rows")
    (1L to 20L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", s"2024-01-0${i % 2 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    // evens live in date=01 (i%2==0 → 0+1); odds in date=02
    val before = fold(t)
    val p1 = Partition(List(ColumnValue(PartitionColumn("date"), "2024-01-01")))
    // the region {even, id<=10} = ids 2,4,6,8,10 is replaced by a SMALLER
    // set {2,4,6} — incoming rows must satisfy the predicate (enforced),
    // so replacement is expressed as net deletion within the region
    spark.sql(
      "INSERT INTO graftrw.db.rw_rows REPLACE WHERE kind = 'even' AND id <= 10 " +
        "SELECT id, kind, date FROM graftrw.db.rw_rows " +
        "WHERE kind = 'even' AND id <= 6")
    val after = fold(t)
    after(p1) should not be before(p1)
    (after - p1) shouldBe (before - p1)
    val rows = DeletionVectors.read(spark, log, t)
    rows.count() shouldBe 18L // 8 and 10 dropped
    rows.where(col("kind") === "even" && col("id") <= 10L)
      .select("id").as[Long].collect().sorted shouldBe Array(2L, 4L, 6L)
  }

  test("merge-on-read tier: zero pointer moves — region hides behind vectors, incoming rides the overlay") {
    val t = mkTable("rw_mor")
    (1L to 20L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", s"2024-01-0${i % 2 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    val before = fold(t)
    spark.conf.set("spark.graft.dml.mergeOnRead", "true")
    try spark.sql(
      "INSERT INTO graftrw.db.rw_mor REPLACE WHERE kind = 'even' AND id <= 10 " +
        "SELECT id, kind, date FROM graftrw.db.rw_mor " +
        "WHERE kind = 'even' AND id <= 6")
    finally spark.conf.unset("spark.graft.dml.mergeOnRead")
    // POINTER-FREE: every partition's version pointer is pinned — the
    // region hid behind deletion vectors, the rows rode the overlay
    fold(t) shouldBe before
    val rows = spark.table("graftrw.db.rw_mor")
    rows.count() shouldBe 18L // 8 and 10 dropped
    rows.where(col("kind") === "even" && col("id") <= 10L)
      .select("id").as[Long].collect().sorted shouldBe Array(2L, 4L, 6L)
    // the guard still holds in merge-on-read mode
    val err = intercept[Exception] {
      spark.conf.set("spark.graft.dml.mergeOnRead", "true")
      try spark.sql(
        "INSERT INTO graftrw.db.rw_mor REPLACE WHERE kind = 'even' " +
          "SELECT 999L AS id, 'odd' AS kind, '2024-01-01' AS date")
      finally spark.conf.unset("spark.graft.dml.mergeOnRead")
    }
    err.getMessage should include("do not satisfy the replace predicate")
    fold(t) shouldBe before
    spark.table("graftrw.db.rw_mor").count() shouldBe 18L
  }

  test("predicate/source split skips string literals (a SELECT inside quotes is not the source)") {
    // head keywords inside '…' literals are data, not the source query
    GraftMaintenanceSql.splitReplaceWhere(
      "kind = 'select all' SELECT 1 AS id") shouldBe
      Some(("kind = 'select all'", "SELECT 1 AS id"))
    GraftMaintenanceSql.splitReplaceWhere(
      "note = 'oops select here' VALUES (1)") shouldBe
      Some(("note = 'oops select here'", "VALUES (1)"))
    // '' escape inside a literal stays inside the literal
    GraftMaintenanceSql.splitReplaceWhere(
      "note = 'it''s from mars' SELECT 2") shouldBe
      Some(("note = 'it''s from mars'", "SELECT 2"))
    // identifiers merely CONTAINING a head keyword do not split
    GraftMaintenanceSql.splitReplaceWhere(
      "from_date >= '2024-01-01' SELECT 3") shouldBe
      Some(("from_date >= '2024-01-01'", "SELECT 3"))
    // no source query at all → None (the statement refuses loudly)
    GraftMaintenanceSql.splitReplaceWhere("kind = 'select all'") shouldBe None
    // end-to-end: the literal-bearing predicate replaces the right rows
    val t = mkTable("rw_quote")
    Seq(Event(1L, "select all", "2024-01-01"), Event(2L, "keep", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    spark.sql(
      "INSERT INTO graftrw.db.rw_quote REPLACE WHERE kind = 'select all' " +
        "SELECT 9 AS id, 'select all' AS kind, '2024-01-01' AS date")
    val rows = DeletionVectors.read(spark, log, t)
    rows.orderBy("id").select("id").as[Long].collect() shouldBe Array(2L, 9L)
  }

  test("incoming rows outside the region refuse; no commit lands") {
    val t = mkTable("rw_guard")
    (1L to 6L).map(i => Event(i, "x", s"2024-01-0${i % 3 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    val before = fold(t)
    val err = intercept[Exception] {
      spark.sql(
        "INSERT INTO graftrw.db.rw_guard REPLACE WHERE date = '2024-01-01' " +
          "SELECT 99L AS id, 'stray' AS kind, '2024-01-03' AS date")
    }
    err.getMessage should include("do not satisfy the replace predicate")
    fold(t) shouldBe before
  }
}
