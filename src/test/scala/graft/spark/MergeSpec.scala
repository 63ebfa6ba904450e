package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

class MergeSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("merge-test")

  private def freshContext(): (VersionContext, TableVersions) = {
    val log = new InMemoryTableVersions
    (VersionContext(VersionedMetastore(log, new InMemoryMetastore)), log)
  }

  private def partitionedTable(name: String): TableDefinition =
    TableDefinition(
      TableName("test", name),
      Files.createTempDirectory(s"graft_spec_$name").toUri,
      PartitionSchema(List(PartitionColumn("date"))),
      FileFormat.Parquet)

  test("merge upserts matched rows, inserts new ones, and leaves untouched partitions' versions alone") {
    val (ctx, log) = freshContext()
    val table = partitionedTable("merge_part")
    ctx.init(table, user, UpdateMessage("init"))

    Seq(
      Event(1, "old", "2024-01-01"), Event(2, "old", "2024-01-01"),
      Event(3, "old", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1Versions = log.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) => pvs
      case other                        => fail(s"unexpected $other")
    }

    // source touches only 2024-01-01: update id=2, insert id=4
    val source = Seq(Event(2, "new", "2024-01-01"), Event(4, "new", "2024-01-01")).toDF()
    Merge.mergeInto(ctx, log, table, source, Seq("id"), user, UpdateMessage("merge"))

    val after = log.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) => pvs
      case other                        => fail(s"unexpected $other")
    }
    val day1 = Partition(ColumnValue(PartitionColumn("date"), "2024-01-01"))
    val day2 = Partition(ColumnValue(PartitionColumn("date"), "2024-01-02"))
    // touched partition re-versioned; untouched partition pointer identical
    after(day1) should not be v1Versions(day1)
    after(day2) shouldBe v1Versions(day2)

    val rows = VersionedReader(spark, log).read(table).as[Event].collect().sortBy(_.id)
    rows shouldBe Array(
      Event(1, "old", "2024-01-01"), Event(2, "new", "2024-01-01"),
      Event(3, "old", "2024-01-02"), Event(4, "new", "2024-01-01"))
  }

  test("merge into a partition the table does not hold yet is a pure insert") {
    val (ctx, log) = freshContext()
    val table = partitionedTable("merge_newpart")
    ctx.init(table, user, UpdateMessage("init"))
    Seq(Event(1, "old", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    Merge.mergeInto(
      ctx, log, table,
      Seq(Event(9, "new", "2024-02-01")).toDF(), Seq("id"), user, UpdateMessage("merge"))

    val rows = VersionedReader(spark, log).read(table).as[Event].collect().sortBy(_.id)
    rows shouldBe Array(Event(1, "old", "2024-01-01"), Event(9, "new", "2024-02-01"))
  }

  test("snapshot merge rewrites the whole snapshot and stays time-travelable") {
    val (ctx, log) = freshContext()
    val table = TableDefinition(
      TableName("test", "merge_snap"),
      Files.createTempDirectory("graft_spec_merge_snap").toUri,
      PartitionSchema.snapshot,
      FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    Seq(Event(1, "old", "d"), Event(2, "old", "d"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.updates(table.name).head.id

    Merge.mergeInto(
      ctx, log, table,
      Seq(Event(2, "new", "d"), Event(3, "new", "d")).toDF(),
      Seq("id"), user, UpdateMessage("merge"))

    val reader = VersionedReader(spark, log)
    reader.read(table).as[Event].collect().sortBy(_.id) shouldBe
      Array(Event(1, "old", "d"), Event(2, "new", "d"), Event(3, "new", "d"))
    // pre-merge state still readable at the v1 commit
    reader.readAsOf(table, v1).as[Event].collect().sortBy(_.id) shouldBe
      Array(Event(1, "old", "d"), Event(2, "old", "d"))
  }

  test("conditional merge matches TABLE-WIDE: a matched row outside the source's partitions still updates") {
    import org.apache.spark.sql.functions.concat
    val (ctx, log) = freshContext()
    val table = partitionedTable("condmerge_wide")
    ctx.init(table, user, UpdateMessage("init"))
    Seq(
      Event(1, "old", "2024-01-01"), Event(7, "old", "2024-01-05"),
      Event(9, "old", "2024-01-09"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) => pvs
      case other                        => fail(s"unexpected $other")
    }

    // the source row carries partition 2024-01-01, but its KEY (7) lives in
    // 2024-01-05 — mergeInto's contract would never see it; the conditional
    // engine's discovery pass must find and update it in place
    val source = Seq(Event(7, "upd", "2024-01-01")).toDF()
    Merge.mergeConditional(
      ctx, log, table, source, Seq("id"),
      matched = Seq(Merge.WhenMatched(None,
        Some(Seq("kind" -> concat(Merge.scol("kind"), Merge.tcol("kind")))))),
      notMatched = Seq(Merge.WhenNotMatched(None,
        Seq("id" -> Merge.scol("id"), "kind" -> Merge.scol("kind"),
          "date" -> Merge.scol("date")))),
      userId = user, message = UpdateMessage("cond merge"))

    VersionedReader(spark, log).read(table)
      .orderBy("id").as[Event].collect() shouldBe Array(
      Event(1, "old", "2024-01-01"), Event(7, "updold", "2024-01-05"),
      Event(9, "old", "2024-01-09"))
    val after = log.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) => pvs
      case other                        => fail(s"unexpected $other")
    }
    // only the partition holding the matched key rewrote
    after(Partition(ColumnValue(PartitionColumn("date"), "2024-01-05"))) should not be
      v1(Partition(ColumnValue(PartitionColumn("date"), "2024-01-05")))
    after(Partition(ColumnValue(PartitionColumn("date"), "2024-01-01"))) shouldBe
      v1(Partition(ColumnValue(PartitionColumn("date"), "2024-01-01")))
    after(Partition(ColumnValue(PartitionColumn("date"), "2024-01-09"))) shouldBe
      v1(Partition(ColumnValue(PartitionColumn("date"), "2024-01-09")))
  }

  test("conditional merge into a never-written table inserts via the declared schema") {
    val (ctx, log) = freshContext()
    val table = partitionedTable("condmerge_empty")
    ctx.init(table, user, UpdateMessage("init"))
    val source = Seq(Event(1, "a", "2024-01-01"), Event(2, "b", "2024-01-02")).toDF()
    Merge.mergeConditional(
      ctx, log, table, source, Seq("id"),
      matched = Nil,
      notMatched = Seq(Merge.WhenNotMatched(None,
        Seq("id" -> Merge.scol("id"), "kind" -> Merge.scol("kind"),
          "date" -> Merge.scol("date")))),
      userId = user, message = UpdateMessage("seed"),
      emptySchema = Some(source.schema))
    VersionedReader(spark, log).read(table)
      .orderBy("id").as[Event].collect() shouldBe Array(
      Event(1, "a", "2024-01-01"), Event(2, "b", "2024-01-02"))

    // an INSERT clause that misses a partition column rejects loudly
    val e = intercept[IllegalArgumentException](Merge.mergeConditional(
      ctx, log, table, source, Seq("id"),
      matched = Nil,
      notMatched = Seq(Merge.WhenNotMatched(None, Seq("id" -> Merge.scol("id")))),
      userId = user, message = UpdateMessage("bad")))
    e.getMessage should include("partition column")
  }

  test("conditional merge rejects an insert producing a NULL partition value instead of dropping it") {
    val (ctx, log) = freshContext()
    val table = partitionedTable("condmerge_nullpart")
    ctx.init(table, user, UpdateMessage("init"))
    Seq(Event(1, "a", "2024-01-01")).toDS()
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    // source row 2 carries a NULL date: the insert's partition value is
    // null, which the equi-semi-join against affected partitions would
    // silently drop — the engine must refuse loudly instead
    val source = Seq((2L, "b", null: String)).toDF("id", "kind", "date")
    val e = intercept[IllegalArgumentException](Merge.mergeConditional(
      ctx, log, table, source, Seq("id"),
      matched = Nil,
      notMatched = Seq(Merge.WhenNotMatched(None,
        Seq("id" -> Merge.scol("id"), "kind" -> Merge.scol("kind"),
          "date" -> Merge.scol("date")))),
      userId = user, message = UpdateMessage("null insert")))
    e.getMessage should include("null or empty")
    // nothing committed, table unchanged
    VersionedReader(spark, log).read(table).count() shouldBe 1L
  }

  test("versioned partitioned reads take dynamic partition pruning from a dim-side filter") {
    import org.apache.spark.sql.functions.{broadcast, col}
    val (ctx, log) = freshContext()
    val table = partitionedTable("dpp")
    ctx.init(table, user, UpdateMessage("init"))
    (1 to 30).map(i => Event(i.toLong, s"k$i", f"2024-01-${i % 3 + 1}%02d"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    // the dim must be a real datasource: a local Seq constant-folds its
    // filter away (ConvertToLocalRelation), and DPP requires a selective
    // Filter node on the pruning side
    val dimPath = Files.createTempDirectory("graft_spec_dpp_dim").toString
    Seq(("2024-01-01", "keep"), ("2024-01-02", "drop"), ("2024-01-03", "drop"))
      .toDF("date", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    // at toy sizes the planner's cost heuristic (rightly) skips DPP; force
    // the benefit estimate so the test exercises the MECHANISM — that the
    // versioned scan's InMemoryFileIndex accepts a runtime pruning subquery
    val ratioKey = "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
    val statsKey = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val prevRatio = spark.conf.getOption(ratioKey)
    val prevStats = spark.conf.getOption(statsKey)
    spark.conf.set(ratioKey, "1000")
    spark.conf.set(statsKey, "false")
    try {
      val joined = VersionedReader(spark, log).read(table)
        .join(broadcast(dim.where(col("tag") === "keep")), Seq("date"))
      joined.count() shouldBe 10
      // the scan's partition filters must carry the runtime pruning
      // subquery: at 100 TB this is the difference between scanning one
      // partition and scanning the table when the partition set comes from
      // a dimension
      joined.queryExecution.executedPlan.toString.toLowerCase should
        include("dynamicpruning")
    } finally {
      prevRatio.fold(spark.conf.unset(ratioKey))(spark.conf.set(ratioKey, _))
      prevStats.fold(spark.conf.unset(statsKey))(spark.conf.set(statsKey, _))
    }
  }

  test("merged-schema read surfaces a later-added column as NULL on old partitions") {
    val (ctx, log) = freshContext()
    val table = partitionedTable("evolve")
    ctx.init(table, user, UpdateMessage("init"))
    Seq(Event(1, "a", "2024-01-01"), Event(2, "b", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1: no score column"))
    Seq((3L, "c", 0.5, "2024-01-02"))
      .toDF("id", "kind", "score", "date")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2: 01-02 refreshed with score"))

    val merged = VersionedReader(spark, log).readMergedSchema(table)
    merged.columns should contain("score")
    val byId = merged.collect().map(r => r.getLong(r.fieldIndex("id")) -> r).toMap
    byId(1L).isNullAt(byId(1L).fieldIndex("score")) shouldBe true
    byId(3L).getDouble(byId(3L).fieldIndex("score")) shouldBe 0.5
    byId.keySet shouldBe Set(1L, 3L) // v2 overwrote the whole 01-02 partition
  }

  test("a COW rewrite rebases over a disjoint intervening commit and refuses an overlapping one") {
    val (ctx, log) = freshContext()
    val table = partitionedTable("rebase")
    ctx.init(table, user, UpdateMessage("init"))
    Seq(Event(1, "a", "2024-01-01"), Event(2, "b", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    // writer A derives a rewrite of 01-01 from this state...
    val readAt = log.currentCommit(table.name)
    // ...writer B lands on the DISJOINT 01-02 first...
    Seq(Event(3, "c", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("writer-B"))
    // ...and A's commit REBASES instead of losing or refusing
    Seq(Event(1, "a2", "2024-01-01"))
      .toDS().versionedInsertIntoRebase(
        ctx, table, user, UpdateMessage("writer-A rebased"), readAt)
    val rows = VersionedReader(spark, log).read(table).as[Event].collect().sortBy(_.id)
    rows.map(_.kind).toSeq shouldBe Seq("a2", "c") // B replaced 01-02 wholesale, A rewrote 01-01

    // an intervening commit on the SAME partition the rewrite touches
    // must refuse loudly — the lost-update window, closed
    val readAt2 = log.currentCommit(table.name)
    Seq(Event(9, "x", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("racer"))
    a[TableVersions.ConcurrentWriteException] should be thrownBy {
      Seq(Event(1, "stale", "2024-01-01"))
        .toDS().versionedInsertIntoRebase(
          ctx, table, user, UpdateMessage("stale rewrite"), readAt2)
    }
    // the refusal committed nothing
    log.updates(table.name).head.message.content shouldBe "racer"
  }

  test("a conditional MERGE that empties a partition removes it in ONE atomic commit") {
    val (ctx, log) = freshContext()
    val table = partitionedTable("merge_empty")
    ctx.init(table, user, UpdateMessage("init"))
    Seq(Event(1, "a", "2024-01-01"), Event(2, "b", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val commitsBefore = log.updates(table.name).size

    // WHEN MATCHED THEN DELETE with a source covering all of 01-02
    Merge.mergeConditional(
      ctx, log, table,
      Seq(Event(2, "b", "2024-01-02")).toDF(), Seq("id"),
      matched = Seq(Merge.WhenMatched(None, None)), notMatched = Nil,
      userId = user, message = UpdateMessage("delete-02"))

    // exactly one commit: the RemovePartition op rides the rewrite commit
    log.updates(table.name).size shouldBe commitsBefore + 1
    val folded = log.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions
    folded.keySet.map(_.hivePath) shouldBe Set("date=2024-01-01")
    VersionedReader(spark, log).read(table).as[Event].collect().map(_.id).toSeq shouldBe Seq(1L)
  }
}
