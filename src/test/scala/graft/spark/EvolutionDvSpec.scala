package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** ADDITIVE EVOLUTION × DELETION VECTORS: the DV scan plan's underlying
  * read infers its schema from ONE footer, so after an evolution a narrow
  * footer could win while wide files hold real values — NULL-aliasing the
  * evolved column would silently blank data ([[GraftDvScanRule]] now
  * detects the short inference and rebuilds with schema merging). These
  * tests pin the composition for a top-level add and a nested add. */
class EvolutionDvSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._
  private val user = UserId("evodv")

  private val log = new InMemoryTableVersions
  private val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
  spark.conf.set("spark.sql.catalog.graftevodv", classOf[GraftTableCatalog].getName)
  GraftTableCatalog.bind("graftevodv", log)

  test("top-level evolution x deletion vectors: wide files keep their values through the DV plan") {
    val t = TableDefinition(
      TableName("db", "evodv"),
      Files.createTempDirectory("graft_evodv").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftevodv", t)
    // v1: narrow files land FIRST in listing order — exactly the footer
    // the single-file inference samples
    spark.sql("SELECT id, 'k' AS kind, '2024-01-01' AS date FROM range(1, 6)")
      .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    spark.sql("ALTER TABLE graftevodv.db.evodv ADD COLUMN score DOUBLE")
    spark.sql(
      "SELECT id, 'k' AS kind, '2024-01-02' AS date, 9.5 AS score FROM range(10, 16)")
      .versionedInsertInto(ctx, t, user, UpdateMessage("v2"))
    spark.table("graftevodv.db.evodv")
      .where(col("score").isNotNull).count() shouldBe 6L
    // force the DV plan
    DeletionVectors.delete(ctx, log, t, col("id") === 1L, user, UpdateMessage("dv"))
    val rows = spark.table("graftevodv.db.evodv")
    rows.count() shouldBe 10L
    rows.where(col("score").isNotNull).count() shouldBe 6L
    rows.where(col("id") === 10L).select("score").as[Double].head() shouldBe 9.5
  }

  test("nested evolution x deletion vectors: wide structs keep their values through the DV plan") {
    val t = TableDefinition(
      TableName("db", "evodvn"),
      Files.createTempDirectory("graft_evodvn").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftevodv", t)
    spark.sql(
      """SELECT id, named_struct('src', concat('s', id)) AS meta,
        |       '2024-01-01' AS date FROM range(1, 6)""".stripMargin)
      .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    spark.sql("ALTER TABLE graftevodv.db.evodvn ADD COLUMN meta.lang STRING")
    spark.sql(
      """SELECT id, named_struct('src', concat('s', id), 'lang', 'en') AS meta,
        |       '2024-01-02' AS date FROM range(10, 16)""".stripMargin)
      .versionedInsertInto(ctx, t, user, UpdateMessage("v2"))
    DeletionVectors.delete(ctx, log, t, col("id") === 2L, user, UpdateMessage("dv"))
    val rows = spark.table("graftevodv.db.evodvn")
    rows.count() shouldBe 10L
    // the wide partition's nested values survive; old files read NULL
    rows.where(col("meta.lang") === "en").count() shouldBe 6L
    rows.where(col("date") === "2024-01-01" && col("meta.lang").isNull)
      .count() shouldBe 4L
  }
}
