package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

final case class CatRow(id: Long, label: String)
final case class CatEvent(id: Long, label: String, date: String)

/** End-to-end: versioned tables addressed from SQL text by catalog name,
  * including `VERSION AS OF` time travel (SURVEY.md §4.3 DSv2 integration). */
class GraftTableCatalogSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._
  private val user = UserId("cat-test")

  private val log = new InMemoryTableVersions
  private val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))

  spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftTableCatalog].getName)
  GraftTableCatalog.bind("graftcat", log)

  test("snapshot table: SQL by name reads the current version; VERSION AS OF time-travels") {
    val table = TableDefinition(
      TableName("cdb", "snap"),
      Files.createTempDirectory("graft_cat_snap").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftcat", table)

    Seq(CatRow(1, "v1a"), CatRow(2, "v1b")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1Commit = log.updates(table.name).head.id
    Seq(CatRow(3, "v2a")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2"))

    spark.sql("SELECT id, label FROM graftcat.cdb.snap ORDER BY id")
      .as[CatRow].collect() shouldBe Array(CatRow(3, "v2a"))

    spark.sql(s"SELECT id, label FROM graftcat.cdb.snap VERSION AS OF '${v1Commit.id}' ORDER BY id")
      .as[CatRow].collect() shouldBe Array(CatRow(1, "v1a"), CatRow(2, "v1b"))
  }

  test("partitioned table: partition columns resolve and prune by path") {
    val table = TableDefinition(
      TableName("cdb", "part"),
      Files.createTempDirectory("graft_cat_part").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftcat", table)

    Seq(CatEvent(1, "a", "2024-01-01"), CatEvent(2, "b", "2024-01-02")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    Seq(CatEvent(3, "c", "2024-01-02")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2"))

    // current state: 01-01 from v1, 01-02 replaced by v2
    spark.sql("SELECT id FROM graftcat.cdb.part ORDER BY id")
      .as[Long].collect() shouldBe Array(1L, 3L)
    // partition-column filter works through the catalog read
    spark.sql("SELECT id FROM graftcat.cdb.part WHERE date = '2024-01-01'")
      .as[Long].collect() shouldBe Array(1L)
  }

  test("ORC snapshot table resolves through the catalog too") {
    val table = TableDefinition(
      TableName("cdb", "snap_orc"),
      Files.createTempDirectory("graft_cat_orc").toUri,
      PartitionSchema.snapshot, FileFormat.Orc)
    ctx.init(table, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftcat", table)
    Seq(CatRow(7, "orc")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    spark.sql("SELECT id, label FROM graftcat.cdb.snap_orc")
      .as[CatRow].collect() shouldBe Array(CatRow(7, "orc"))
  }

  test("SQL joins across catalog tables and the read-only contract") {
    spark.sql(
      """SELECT s.label, p.label FROM graftcat.cdb.snap s
        |JOIN graftcat.cdb.part p ON s.id = p.id""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))) shouldBe Array(("v2a", "c"))

    val e = intercept[Exception](spark.sql("DROP TABLE graftcat.cdb.snap").collect())
    e.getMessage should include("read-only")
    spark.sql("SHOW TABLES IN graftcat.cdb").collect()
      .map(_.getString(1)).sorted shouldBe Array("part", "snap", "snap_orc")
  }
}
