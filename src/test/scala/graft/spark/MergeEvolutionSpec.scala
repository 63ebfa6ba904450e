package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** MERGE schema evolution (`spark.graft.dml.autoMergeSchema`, the Delta
  * autoMerge contract): a canonical `UPDATE SET * / INSERT *` MERGE whose
  * source carries a NEW column widens the declared schema (metadata-only
  * commit), lands the column on touched partitions, and reads it as a
  * typed NULL everywhere else. Without the flag, extra source columns
  * drop at the alignment (the existing contract). */
class MergeEvolutionSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._
  private val user = UserId("mev")

  private val log = new InMemoryTableVersions
  private val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
  spark.conf.set("spark.sql.catalog.graftmev", classOf[GraftTableCatalog].getName)
  GraftTableCatalog.bind("graftmev", log)

  private def mkTable(name: String): TableDefinition = {
    val t = TableDefinition(
      TableName("db", name),
      Files.createTempDirectory(s"graft_mev_$name").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftmev", t)
    t
  }

  test("autoMergeSchema: new source column widens schema, old rows read NULL") {
    val t = mkTable("mev_t")
    (1L to 10L).map(i => Event(i, "base", s"2024-01-0${i % 2 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))

    // source carries a NEW column 'score'; touches only date=2024-01-01
    // (ids 2,4 update; 100 inserts)
    Seq((2L, "upd", "2024-01-01", 0.5), (4L, "upd", "2024-01-01", 0.7),
        (100L, "new", "2024-01-01", 0.9))
      .toDF("id", "kind", "date", "score").createOrReplaceTempView("mev_src")

    spark.conf.set("spark.graft.dml.autoMergeSchema", "true")
    try spark.sql(
      """MERGE INTO graftmev.db.mev_t t USING mev_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    finally spark.conf.unset("spark.graft.dml.autoMergeSchema")

    // SQL reads see the widened schema; pre-evolution rows (incl. the
    // UNTOUCHED date=2024-01-02 partition) read NULL
    val after = spark.table("graftmev.db.mev_t")
    after.columns.map(_.toLowerCase) should contain("score")
    after.count() shouldBe 11L
    after.where(col("id") === 2L).select("score").as[Double].head() shouldBe 0.5
    after.where(col("id") === 100L).select("score").as[Double].head() shouldBe 0.9
    // carried row in the touched partition: NULL score
    after.where(col("id") === 6L).select("score").isEmpty shouldBe false
    after.where(col("id") === 6L && col("score").isNull).count() shouldBe 1L
    // untouched partition: NULL score
    after.where(col("date") === "2024-01-02" && col("score").isNotNull)
      .count() shouldBe 0L
    // the evolution is an auditable metadata-only commit
    log.updates(t.name).map(_.message.content)
      .exists(_.startsWith("MERGE SCHEMA EVOLUTION")) shouldBe true
  }

  test("the TABLE property drives autoMerge with no session conf anywhere") {
    val t = mkTable("mev_prop")
    (1L to 4L).map(i => Event(i, "base", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    TableProperties.set(spark, ctx, t,
      Map(TableProperties.AutoMergeSchema -> "true"), user)
    Seq((2L, "upd", "2024-01-01", 0.5))
      .toDF("id", "kind", "date", "score").createOrReplaceTempView("mev_psrc")

    // session conf deliberately UNSET (and even set to false: the table
    // property must win)
    spark.conf.set("spark.graft.dml.autoMergeSchema", "false")
    try spark.sql(
      """MERGE INTO graftmev.db.mev_prop t USING mev_psrc s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    finally spark.conf.unset("spark.graft.dml.autoMergeSchema")

    val after = spark.table("graftmev.db.mev_prop")
    after.columns.map(_.toLowerCase) should contain("score")
    after.where(col("id") === 2L).select("score").as[Double].head() shouldBe 0.5
    after.where(col("id") === 1L && col("score").isNull).count() shouldBe 1L
  }

  test("a failing merge leaves the schema UNWIDENED (atomicity: no phantom column)") {
    val t = mkTable("mev_fail")
    (1L to 4L).map(i => Event(i, "base", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    // a write-path CHECK constraint the incoming row violates: the merge's
    // data commit fails INSIDE the write job, after the evolution decision
    Constraints.add(spark, ctx, t, Constraints.check("pos", "id > 0"), user)
    Seq((-7L, "bad", "2024-01-01", 1.0))
      .toDF("id", "kind", "date", "score").createOrReplaceTempView("mev_fail_src")
    spark.conf.set("spark.graft.dml.autoMergeSchema", "true")
    try {
      an[Exception] should be thrownBy spark.sql(
        """MERGE INTO graftmev.db.mev_fail t USING mev_fail_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    } finally spark.conf.unset("spark.graft.dml.autoMergeSchema")
    // neither the declared schema nor the audit log carry the evolution
    val after = spark.table("graftmev.db.mev_fail")
    after.columns.map(_.toLowerCase) should not contain "score"
    after.count() shouldBe 4L
    log.updates(t.name).map(_.message.content)
      .exists(_.startsWith("MERGE SCHEMA EVOLUTION")) shouldBe false
  }

  test("without the flag, extra source columns drop (existing contract)") {
    val t = mkTable("mev_off")
    (1L to 4L).map(i => Event(i, "base", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    Seq((2L, "upd", "2024-01-01", 9.9))
      .toDF("id", "kind", "date", "score").createOrReplaceTempView("mev_off_src")
    spark.sql(
      """MERGE INTO graftmev.db.mev_off t USING mev_off_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = spark.table("graftmev.db.mev_off")
    after.columns.map(_.toLowerCase) should not contain "score"
    after.where(col("id") === 2L).select("kind").as[String].head() shouldBe "upd"
  }
}
