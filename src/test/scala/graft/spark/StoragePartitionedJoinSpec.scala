package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

class StoragePartitionedJoinSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("spj-test")

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q) ++ walk(q.plan)
    case other =>
      Seq(other) ++ other.children.flatMap(walk) ++ other.subqueries.flatMap(walk)
  }

  private def shuffles(plan: SparkPlan): Int =
    walk(plan).count(_.isInstanceOf[ShuffleExchangeExec])

  test("co-partitioned graft tables join with ZERO exchanges under the SPJ opt-in") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    spark.conf.set("spark.sql.catalog.graftspj", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("graftspj", log)

    def mkTable(name: String): TableDefinition = {
      val t = TableDefinition(
        TableName("db", name),
        Files.createTempDirectory(s"graft_spj_$name").toUri,
        PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      GraftTableCatalog.register("graftspj", t)
      t
    }
    mkTable("facts")
    mkTable("dims")
    (1L to 300L).map(i => Event(i, s"k${i % 7}", s"2024-01-0${i % 3 + 1}"))
      .toDS().versionedInsertInto(
        ctx, GraftTableCatalog.lookup("graftspj", TableName("db", "facts")).get._2,
        user, UpdateMessage("v1"))
    // dims carries the same three partitions PLUS one the facts side lacks
    ((1L to 40L).map(i => Event(i + 1000, s"d${i % 5}", s"2024-01-0${i % 3 + 1}")) :+
      Event(9999L, "extra", "2024-02-01"))
      .toDS().versionedInsertInto(
        ctx, GraftTableCatalog.lookup("graftspj", TableName("db", "dims")).get._2,
        user, UpdateMessage("v1"))

    val sql =
      """SELECT f.date, count(*) AS n
        |FROM graftspj.db.facts f JOIN graftspj.db.dims d ON f.date = d.date
        |GROUP BY f.date ORDER BY f.date""".stripMargin

    def run(): (Array[(String, Long)], Int) = {
      val df = spark.sql(sql)
      val rows = df.as[(String, Long)].collect()
      (rows, shuffles(df.queryExecution.executedPlan))
    }

    val saved = Seq(
      "spark.graft.storagePartitionedJoin.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      spark.conf.set("spark.graft.storagePartitionedJoin.enabled", "false")
      val (plainRows, plainShuffles) = run()
      plainShuffles should be > 0 // sanity: the stock plan shuffles both sides

      spark.conf.set("spark.graft.storagePartitionedJoin.enabled", "true")
      val (keyedRows, keyedShuffles) = run()
      // the join itself is exchange-free; only the final ordered aggregate
      // may move data. Same answer, and the unmatched 2024-02-01 partition
      // on the dims side is dropped by the join, not mis-grouped.
      keyedRows shouldBe plainRows
      keyedRows.map(_._1) shouldBe Array("2024-01-01", "2024-01-02", "2024-01-03")
      keyedShuffles should be < plainShuffles
      // the join sits directly on the scans: no exchange anywhere below it
      val df2 = spark.sql(sql)
      df2.collect()
      val nodes = walk(df2.queryExecution.executedPlan)
      val join = nodes.find(_.nodeName.contains("Join"))
        .getOrElse(fail(s"no join node in:\n${df2.queryExecution.executedPlan}"))
      walk(join).drop(1).count(_.isInstanceOf[ShuffleExchangeExec]) shouldBe 0
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("a partition-key aggregation needs no exchange under the SPJ opt-in") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    spark.conf.set("spark.sql.catalog.graftspja", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("graftspja", log)
    val t = TableDefinition(
      TableName("db", "aggd"),
      Files.createTempDirectory("graft_spja").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftspja", t)
    (1L to 120L).map(i => Event(i, s"k$i", s"2024-01-0${i % 4 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))

    val saved = spark.conf.getOption("spark.graft.storagePartitionedJoin.enabled")
    try {
      spark.conf.set("spark.graft.storagePartitionedJoin.enabled", "true")
      val df = spark.sql(
        "SELECT date, count(*) AS n FROM graftspja.db.aggd GROUP BY date")
      val rows = df.as[(String, Long)].collect().sortBy(_._1)
      rows.map(_._2) shouldBe Array(30L, 30L, 30L, 30L)
      // the scan's key-grouped layout IS the clustering the aggregate
      // needs: partial+final collapse with zero exchanges
      shuffles(df.queryExecution.executedPlan) shouldBe 0
    } finally saved match {
      case Some(v) => spark.conf.set("spark.graft.storagePartitionedJoin.enabled", v)
      case None    => spark.conf.unset("spark.graft.storagePartitionedJoin.enabled")
    }
  }
}
