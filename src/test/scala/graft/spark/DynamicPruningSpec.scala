package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** DYNAMIC PARTITION PRUNING through the DSv2 catalog
  * (`GraftRuntimeFiltering`): Spark's V2 FileScan has no runtime-filtering
  * interface, so without the wrapper a star join against a versioned table
  * statically scans every partition the log references. These tests pin
  * (a) the DPP subquery lands on the fact scan, (b) execution reads ONLY
  * the matching partitions' rows, and (c) the wrapper forwards the static
  * pushdown surface untouched. */
class DynamicPruningSpec extends AnyFunSuite with Matchers
  with AdaptiveSparkPlanHelper {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("dpp-test")

  test("a dim-filtered join prunes the versioned fact's partitions at runtime") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "dpp_fact"),
      Files.createTempDirectory("graft_dpp").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    spark.conf.set("spark.sql.catalog.graftdpp", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("graftdpp", log)
    GraftTableCatalog.register("graftdpp", table)
    (1L to 1000L).map(i => Event(i, s"k$i", f"2024-01-${i % 20 + 1}%02d"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("2024-01-03", "x"), ("2024-01-04", "y")).toDF("date", "tag")
      .write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("dpp_dim")

    // local-scale benefit heuristics would reject a KB-sized fact; force
    // the decision the planner takes organically at real fact sizes
    val confs = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = spark.sql(
        """SELECT f.id FROM graftdpp.test.dpp_fact f
          |JOIN dpp_dim d ON f.date = d.date WHERE d.tag = 'x'""".stripMargin)
      // correctness: exactly the 2024-01-03 partition's ids
      val got = df.as[Long].collect().sorted
      got shouldBe (1L to 1000L).filter(i => i % 20 + 1 == 3).toArray
      // the DPP runtime filter landed on the fact scan
      val planStr = df.queryExecution.executedPlan.toString
      planStr should include("dynamicpruningexpression")

      // and the runtime filter genuinely PRUNES: drive the wrapped scan
      // directly — a runtime EqualTo on the partition column must shrink
      // the planned input partitions to the one matching dir's files
      val scan = {
        val cat = spark.sessionState.catalogManager.catalog("graftdpp")
          .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array("test"), "dpp_fact"))
        t.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
          .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
            java.util.Collections.emptyMap())).build()
      }
      val dpp = scan
        .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.GraftDppFileScan]
      // count FILES, not planned splits — tiny files bin-pack into the
      // same split count either way
      def nFiles(b: org.apache.spark.sql.connector.read.Batch): Int =
        b.planInputPartitions().map(_.asInstanceOf[
          org.apache.spark.sql.execution.datasources.FilePartition].files.length).sum
      val all = nFiles(dpp.toBatch)
      // the runtime value arrives typed like the inferred partition column
      // (catalog scans keep Spark's partition type inference: date strings
      // infer as DATE)
      dpp.filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.EqualTo(
          "date", java.sql.Date.valueOf("2024-01-03"))))
      val kept = nFiles(dpp.toBatch)
      all should be >= 20 // one file per date partition at minimum
      kept should be < all
      kept should be > 0
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("the DPP wrapper forwards static pushdown: filters and column pruning reach the scan") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "dpp_push"),
      Files.createTempDirectory("graft_dpp_push").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    spark.conf.set("spark.sql.catalog.graftdpp2", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("graftdpp2", log)
    GraftTableCatalog.register("graftdpp2", table)
    (1L to 100L).map(i => Event(i, s"k$i", if (i % 2 == 0) "2024-01-01" else "2024-01-02"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    val df = spark.sql(
      "SELECT id FROM graftdpp2.test.dpp_push WHERE id > 90 AND date = '2024-01-01'")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(id), GreaterThan(id,90)")
    plan should include("ReadSchema: struct<id:bigint>") // kind pruned away
    // static partition pruning via the catalyst-filter channel survives
    // the wrapper: the partition equality reaches PartitionFilters
    plan.split("\n").find(_.contains("PartitionFilters"))
      .get should include("date")
    df.as[Long].collect().sorted shouldBe Array(92L, 94L, 96L, 98L, 100L)
  }
}
