package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** Catalog-integration suite mirroring the reference's
  * `SparkHiveMetastoreSpec` + loader e2e
  * (`spark/src/test/.../SparkHiveMetastoreSpec.scala:23-29`,
  * `examples/src/test/.../DatePartitionedTableLoaderSpec.scala:41-149`):
  * after every versioned insert the session catalog's LOCATIONs point at the
  * right version dirs, so plain `spark.table(...)` — the reference read
  * path — sees exactly the current version, and checkout flips it back.
  */
class SparkCatalogMetastoreSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("catalog-test")
  spark.sql("CREATE DATABASE IF NOT EXISTS graftdb")

  test("snapshot table: catalog location tracks versions through insert and checkout") {
    val loc = Files.createTempDirectory("graft_cat_snap").toUri
    spark.sql(s"CREATE TABLE graftdb.users_cat (id BIGINT, name STRING) USING parquet LOCATION '$loc'")
    val table = TableDefinition(
      TableName("graftdb", "users_cat"), loc, PartitionSchema.snapshot, FileFormat.Parquet)

    val log = new InMemoryTableVersions
    val metastore = new SparkCatalogMetastore(spark)
    val ctx = VersionContext(VersionedMetastore(log, metastore))
    ctx.init(table, user, UpdateMessage("init"))

    Seq(User(1, "ada")).toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    spark.table("graftdb.users_cat").as[User].collect() shouldBe Array(User(1, "ada"))

    Seq(User(2, "bob")).toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v2"))
    spark.table("graftdb.users_cat").as[User].collect() shouldBe Array(User(2, "bob"))

    // metastore state parses the version back out of the catalog location
    metastore.currentVersion(table.name) shouldBe log.currentVersion(table.name)

    // rollback: catalog location flips back to the v1 dir
    val v1 = log.updates(table.name).find(_.message.content == "v1").get.id
    ctx.metastore.checkout(table.name, v1)
    spark.table("graftdb.users_cat").as[User].collect() shouldBe Array(User(1, "ada"))
  }

  test("partitioned table: per-partition locations track versions; pruning still applies") {
    val loc = Files.createTempDirectory("graft_cat_part").toUri
    spark.sql(
      s"""CREATE TABLE graftdb.events_cat (id BIGINT, kind STRING, date STRING)
         |USING parquet PARTITIONED BY (date) LOCATION '$loc'""".stripMargin)
    val table = TableDefinition(
      TableName("graftdb", "events_cat"), loc,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)

    val log = new InMemoryTableVersions
    val metastore = new SparkCatalogMetastore(spark)
    val ctx = VersionContext(VersionedMetastore(log, metastore))
    ctx.init(table, user, UpdateMessage("init"))

    Seq(Event(1, "click", "2024-01-01"), Event(2, "view", "2024-01-02")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    // overwrite only one partition
    Seq(Event(3, "purchase", "2024-01-02")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2"))

    val rows = spark.table("graftdb.events_cat")
      .select("id", "kind", "date").as[(Long, String, String)].collect().sortBy(_._1)
    rows shouldBe Array((1L, "click", "2024-01-01"), (3L, "purchase", "2024-01-02"))

    // partition-pruned read over catalog locations
    spark.table("graftdb.events_cat").where($"date" === "2024-01-01")
      .count() shouldBe 1

    // catalog agrees with the log
    metastore.currentVersion(table.name) shouldBe log.currentVersion(table.name)

    // rollback restores the original 2024-01-02 partition location
    val v1 = log.updates(table.name).find(_.message.content == "v1").get.id
    ctx.metastore.checkout(table.name, v1)
    spark.table("graftdb.events_cat")
      .select("id", "kind", "date").as[(Long, String, String)].collect().sortBy(_._1) shouldBe
      Array((1L, "click", "2024-01-01"), (2L, "view", "2024-01-02"))
  }

  test("partition values with quotes and trailing backslashes survive DDL escaping") {
    val loc = Files.createTempDirectory("graft_cat_esc").toUri
    spark.sql(
      s"""CREATE TABLE graftdb.esc_cat (id BIGINT, kind STRING, date STRING)
         |USING parquet PARTITIONED BY (date) LOCATION '$loc'""".stripMargin)
    val table = TableDefinition(
      TableName("graftdb", "esc_cat"), loc,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)

    val log = new InMemoryTableVersions
    val metastore = new SparkCatalogMetastore(spark)
    val ctx = VersionContext(VersionedMetastore(log, metastore))
    ctx.init(table, user, UpdateMessage("init"))

    // a value ending in '\' swallows the closing quote if only quotes are
    // escaped; one with a quote malforms the literal if backslashes aren't
    Seq(Event(1, "a", """x\"""), Event(2, "b", "it's")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    spark.table("graftdb.esc_cat")
      .select("id", "date").as[(Long, String)].collect().sortBy(_._1) shouldBe
      Array((1L, """x\"""), (2L, "it's"))
    metastore.currentVersion(table.name) shouldBe log.currentVersion(table.name)
  }
}
