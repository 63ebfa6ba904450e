package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** SQL DML with subquery conditions (`DELETE … WHERE k IN (SELECT …)`,
  * `UPDATE … WHERE EXISTS (…)`): the analyzed subquery plan re-anchors
  * inside the command's own read and Spark's subquery planning rewrites
  * it into the semi/anti join a SELECT would get — copy-on-write and
  * merge-on-read both. Correlated subqueries re-express as a
  * non-correlated row-membership test built from the statement's own
  * resolved plan ([[GraftDmlRule.membershipRewrite]]). */
class DmlSubquerySpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._
  private val user = UserId("dml-subq")

  private val log = new InMemoryTableVersions
  private val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
  spark.conf.set("spark.sql.catalog.graftsq", classOf[GraftTableCatalog].getName)
  GraftTableCatalog.bind("graftsq", log)

  private def mkTable(name: String): TableDefinition = {
    val t = TableDefinition(
      TableName("db", name),
      Files.createTempDirectory(s"graft_sq_$name").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftsq", t)
    t
  }

  test("DELETE with IN-subquery: copy-on-write and merge-on-read") {
    val t = mkTable("del_in")
    val picks = mkTable("picks")
    (1L to 30L).map(i => Event(i, s"k$i", s"2024-01-0${i % 3 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    Seq(Event(3L, "x", "2024-01-01"), Event(7L, "x", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, picks, user, UpdateMessage("picks"))

    // copy-on-write: the IN-subquery reads ANOTHER graft table
    spark.sql(
      "DELETE FROM graftsq.db.del_in WHERE id IN (SELECT id FROM graftsq.db.picks)")
    val after = DeletionVectors.read(spark, log, t)
    after.count() shouldBe 28L
    after.where(col("id").isin(3L, 7L)).count() shouldBe 0L

    // merge-on-read: vectors, zero pointer moves
    val fold = log.currentVersion(t.name)
    spark.conf.set("spark.graft.dml.mergeOnRead", "true")
    try
      spark.sql(
        "DELETE FROM graftsq.db.del_in WHERE id IN " +
          "(SELECT id + 2 AS id FROM graftsq.db.picks)")
    finally spark.conf.unset("spark.graft.dml.mergeOnRead")
    log.currentVersion(t.name) shouldBe fold
    val after2 = DeletionVectors.read(spark, log, t)
    after2.count() shouldBe 26L
    after2.where(col("id").isin(5L, 9L)).count() shouldBe 0L
  }

  test("UPDATE with IN-subquery and NOT IN; EXISTS delete; correlated refuses") {
    val t = mkTable("upd_in")
    (1L to 20L).map(i => Event(i, "plain", s"2024-01-0${i % 2 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))

    spark.sql(
      "UPDATE graftsq.db.upd_in SET kind = 'picked' WHERE id IN " +
        "(SELECT id FROM graftsq.db.upd_in WHERE id <= 4)")
    val after = DeletionVectors.read(spark, log, t)
    after.where(col("kind") === "picked").count() shouldBe 4L

    // NOT IN (null-free subquery): the anti-join side
    spark.sql(
      "UPDATE graftsq.db.upd_in SET kind = 'rest' WHERE id NOT IN " +
        "(SELECT id FROM graftsq.db.upd_in WHERE id <= 16)")
    DeletionVectors.read(spark, log, t)
      .where(col("kind") === "rest").count() shouldBe 4L

    // EXISTS (non-correlated)
    spark.sql(
      "DELETE FROM graftsq.db.upd_in WHERE kind = 'rest' AND EXISTS " +
        "(SELECT 1 FROM graftsq.db.upd_in WHERE kind = 'picked')")
    DeletionVectors.read(spark, log, t).count() shouldBe 16L

  }

  test("correlated EXISTS / IN: delete and update, copy-on-write and merge-on-read") {
    val t = mkTable("corr_t")
    val s2 = mkTable("corr_s")
    (1L to 20L).map(i => Event(i, "plain", s"2024-01-0${i % 2 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    Seq(Event(3L, "x", "2024-01-01"), Event(7L, "x", "2024-01-02"),
        Event(40L, "x", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, s2, user, UpdateMessage("s"))

    // correlated EXISTS delete (copy-on-write)
    spark.sql(
      "DELETE FROM graftsq.db.corr_t a WHERE EXISTS " +
        "(SELECT 1 FROM graftsq.db.corr_s b WHERE b.id = a.id)")
    val afterDel = DeletionVectors.read(spark, log, t)
    afterDel.count() shouldBe 18L
    afterDel.where(col("id").isin(3L, 7L)).count() shouldBe 0L

    // correlated IN update (copy-on-write): correlation on a SECOND
    // column (date) — only id 4 has b.id+1 matching AND the same date
    spark.sql(
      "UPDATE graftsq.db.corr_t a SET kind = 'next' WHERE a.id IN " +
        "(SELECT b.id + 1 FROM graftsq.db.corr_s b WHERE b.date = a.date)")
    val afterUpd = DeletionVectors.read(spark, log, t)
    afterUpd.where(col("kind") === "next").select("id")
      .as[Long].collect().toSet shouldBe Set(4L)

    // merge-on-read: correlated delete lands as vectors, zero pointer moves
    val fold = log.currentVersion(t.name)
    spark.conf.set("spark.graft.dml.mergeOnRead", "true")
    try {
      spark.sql(
        "DELETE FROM graftsq.db.corr_t a WHERE EXISTS " +
          "(SELECT 1 FROM graftsq.db.corr_s b WHERE b.id = a.id * 2)")
      // correlated MOR update through the row overlay
      spark.sql(
        "UPDATE graftsq.db.corr_t a SET kind = 'half' WHERE EXISTS " +
          "(SELECT 1 FROM graftsq.db.corr_s b WHERE b.id = a.id * 4)")
    } finally spark.conf.unset("spark.graft.dml.mergeOnRead")
    log.currentVersion(t.name) shouldBe fold
    val afterMor = DeletionVectors.read(spark, log, t)
    afterMor.count() shouldBe 17L // id 20 (= 40/2) vector-hidden
    afterMor.where(col("id") === 20L).count() shouldBe 0L
    afterMor.where(col("kind") === "half").select("id")
      .as[Long].collect().toSet shouldBe Set(10L) // 40/4

    // a NULL in a column the predicate never touches must not unmatch the
    // row (value-membership rides ordering-based struct equality)
    spark.sql("UPDATE graftsq.db.corr_t SET kind = NULL WHERE id = 11")
    spark.sql(
      "DELETE FROM graftsq.db.corr_t a WHERE EXISTS " +
        "(SELECT 1 FROM graftsq.db.corr_s b WHERE b.id = a.id - 8)")
    val afterNull = DeletionVectors.read(spark, log, t)
    afterNull.where(col("id").isin(11L, 15L)).count() shouldBe 0L // both gone
    afterNull.count() shouldBe 15L
  }
}
