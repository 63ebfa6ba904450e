package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** ADDITIVE EVOLUTION × REWRITE PATHS: a partition holding BOTH narrow
  * (pre-evolution) and wide files must keep the wide files' values
  * through every path that READS THEN REWRITES (or replays) it — the
  * catalog INSERT's carry-union, OPTIMIZE, the MERGE rewrite, and the
  * change feed. A short schema inference here would not just blank a
  * read: a rewrite would BAKE the NULLs into fresh files, permanently.
  * (The DV-plan variant of this hazard is pinned in [[EvolutionDvSpec]].) */
class EvolutionRewriteSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.session
  import spark.implicits._
  private val user = UserId("evorw")
  private val log = new InMemoryTableVersions
  private val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
  spark.conf.set("spark.sql.catalog.graftevorw", classOf[GraftTableCatalog].getName)
  GraftTableCatalog.bind("graftevorw", log)

  // ONE partition holding BOTH a narrow (pre-evolution) and a wide file:
  // the rewrite hazard needs mixed widths inside one rewritten partition
  private def mixedTable(name: String): TableDefinition = {
    val t = TableDefinition(
      TableName("db", name),
      Files.createTempDirectory(s"graft_evorw_$name").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftevorw", t)
    spark.sql("SELECT id, 'k' AS kind, '2024-01-01' AS date FROM range(1, 6)")
      .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    spark.sql(s"ALTER TABLE graftevorw.db.$name ADD COLUMN score DOUBLE")
    // catalog INSERT appends INTO THE SAME partition (carry-union path)
    spark.sql(
      s"""INSERT INTO graftevorw.db.$name (id, kind, date, score)
         |SELECT id, 'k' AS kind, DATE'2024-01-01' AS date, 9.5 AS score
         |FROM range(10, 16)""".stripMargin)
    t
  }

  test("catalog INSERT carry after evolution keeps wide values") {
    val t = mixedTable("ins")
    val rows = spark.table("graftevorw.db.ins")
    rows.count() shouldBe 11L
    rows.where(col("score").isNotNull).count() shouldBe 6L
  }

  test("OPTIMIZE after evolution must not bake NULLs into the rewrite") {
    val t = mixedTable("opt")
    spark.table("graftevorw.db.opt").where(col("score").isNotNull).count() shouldBe 6L
    Compaction.compact(spark, ctx, t, user, UpdateMessage("optimize"))
    val rows = spark.table("graftevorw.db.opt")
    rows.count() shouldBe 11L
    rows.where(col("score").isNotNull).count() shouldBe 6L
  }

  test("MERGE rewrite after evolution must not bake NULLs into carried rows") {
    val t = mixedTable("mrg")
    Seq((3L, "upd", java.sql.Date.valueOf("2024-01-01"), 1.5))
      .toDF("id", "kind", "date", "score").createOrReplaceTempView("evorw_src")
    spark.sql(
      """MERGE INTO graftevorw.db.mrg t USING evorw_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.table("graftevorw.db.mrg")
    rows.count() shouldBe 11L
    // carried wide rows (ids 10..15) must keep 9.5; id 3 updated to 1.5
    rows.where(col("id") === 3L).select("score").as[Double].head() shouldBe 1.5
    rows.where(col("id") >= 10L && col("score") === 9.5).count() shouldBe 6L
  }

  test("change feed after evolution serves wide values") {
    val t = mixedTable("cf")
    val commits = log.updates(t.name).map(_.id).reverse // oldest first
    val feed = ChangeFeed.read(spark, log, t, Some(commits.head), commits.last)
    feed.where(col("_change_type") === "insert" && col("score").isNotNull)
      .count() shouldBe 6L
  }
}
