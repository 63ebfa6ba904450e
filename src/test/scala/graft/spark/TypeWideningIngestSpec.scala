package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit, named_struct, sum}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** AUTOMATIC TYPE WIDENING on ingest (`graft.dml.typeWidening`, the Delta
  * typeWidening contract): MERGE / COPY INTO sources carrying losslessly
  * WIDER numeric leaves widen the TABLE (a metadata-only
  * [[ColumnMapping.widenPath]] per leaf, declared before the data) instead
  * of casting the source down; without the property the pre-existing
  * cast-down alignment stands. */
class TypeWideningIngestSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("tw-test")

  test("MERGE under graft.dml.typeWidening widens int->bigint (top-level + nested) instead of casting down") {
    val log = new InMemoryTableVersions
    spark.conf.set("spark.sql.catalog.grafttw", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("grafttw", log)
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("db", "tw_merge"),
      Files.createTempDirectory("graft_tw_merge").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    (1 to 4).toDF("i").select(
      col("i").cast("long").as("id"),
      col("i").cast("int").as("n"),
      named_struct(lit("cnt"), col("i").cast("int")).as("meta"),
      lit("2024-01-01").as("date"))
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: narrow"))
    GraftTableCatalog.register("grafttw", table,
      Some(VersionedReader(spark, log).read(table).schema))
    val name = "grafttw.db.tw_merge"
    val preMerge = log.currentCommit(table.name)

    // the source carries bigint leaves with values int cannot hold
    spark.range(1).select(
      lit(2L).as("id"),
      lit(6000000000L).as("n"),
      named_struct(lit("cnt"), lit(7000000000L)).as("meta"),
      lit("2024-01-01").as("date")).createOrReplaceTempView("tw_src")

    // WITHOUT the property: the pre-existing cast-down alignment stands —
    // under ANSI the overflowing value fails the merge loudly; the table
    // stays narrow and no widen commit appears
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $name t USING tw_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    spark.table(name).schema("n").dataType.catalogString shouldBe "int"
    log.updates(table.name).map(_.message.content)
      .exists(_.contains("WIDEN TYPES")) shouldBe false

    // WITH the table property: the table widens, the wide values land
    spark.sql(s"ALTER TABLE $name SET TBLPROPERTIES ('graft.dml.typeWidening' = 'true')")
    spark.sql(
      s"""MERGE INTO $name t USING tw_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = spark.table(name)
    after.schema("n").dataType.catalogString shouldBe "bigint"
    after.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("cnt")
      .dataType.catalogString shouldBe "bigint"
    after.where(col("id") === 2).select(col("n")).head().getLong(0) shouldBe 6000000000L
    after.where(col("id") === 2).select(col("meta.cnt")).head()
      .getLong(0) shouldBe 7000000000L
    after.agg(sum(col("n"))).head().getLong(0) shouldBe (1L + 3L + 4L + 6000000000L)
    log.updates(table.name).map(_.message.content)
      .exists(_.contains("WIDEN TYPES (meta.cnt, n)")) shouldBe true
    // time travel before the widening merge reads the narrow types
    ColumnMapping.read(spark, log, table, Some(preMerge))
      .schema("n").dataType.catalogString shouldBe "int"
  }

  test("COPY INTO under graft.dml.typeWidening widens from a wider parquet batch; merge-on-read refuses before widening") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("db", "tw_copy"),
      Files.createTempDirectory("graft_tw_copy").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    (1 to 3).toDF("i").select(
      col("i").cast("long").as("id"),
      col("i").cast("float").as("x"),
      lit("2024-01-01").as("date"))
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: float"))
    TableProperties.set(spark, ctx, table,
      Map(TableProperties.TypeWidening -> "true"), user)

    val landing = Files.createTempDirectory("graft_tw_landing")
    spark.range(1).select(
      lit(9L).as("id"), lit(1.0e40).as("x"), lit("2024-01-02").as("date"))
      .coalesce(1).write.mode("overwrite").parquet(landing.toString)

    // merge-on-read refuses the evolving batch BEFORE any widen lands
    SessionConf.withConf(spark, "spark.graft.dml.mergeOnRead", "true") {
      val e = intercept[IllegalArgumentException] {
        CopyInto.ingest(spark, ctx, table, landing.toString, "parquet", user)
      }
      e.getMessage should include("mergeOnRead")
    }
    ColumnMapping.read(spark, log, table)
      .schema("x").dataType.catalogString shouldBe "float"

    // the copy-on-write ingest widens float->double and lands the value
    val res = CopyInto.ingest(spark, ctx, table, landing.toString, "parquet", user)
    res.ingestedFiles should have size 1
    val mapped = ColumnMapping.read(spark, log, table)
    mapped.schema("x").dataType.catalogString shouldBe "double"
    mapped.where(col("id") === 9).select(col("x")).head().getDouble(0) shouldBe 1.0e40
    mapped.count() shouldBe 4L
    log.updates(table.name).map(_.message.content)
      .exists(_.contains("WIDEN TYPES (x)")) shouldBe true
  }
}
