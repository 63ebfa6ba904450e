package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

class MaterializedViewSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("mv-test")

  /** A fresh catalog+log with one registered partitioned source table. */
  private def setup(cat: String): (VersionContext, InMemoryTableVersions, TableDefinition) = {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind(cat, log)
    val table = TableDefinition(
      TableName("db", "events"),
      Files.createTempDirectory(s"graft_mv_$cat").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    GraftTableCatalog.register(cat, table)
    (ctx, log, table)
  }

  private def mvLoc(): String = Files.createTempDirectory("graft_mv_loc").toUri.toString

  test("incremental refresh tracks inserts, rewrites, and DV deletes; group death drops the row") {
    val (ctx, log, table) = setup("mvc1")
    (1L to 30L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", s"2024-01-0${i % 3 + 1}"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvc1.db.by_kind LOCATION '${mvLoc()}'
         |AS SELECT kind, count(*) AS n, sum(id) AS sum_id
         |FROM mvc1.db.events GROUP BY kind""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvc1", TableName("db", "by_kind")).get._2
    val reader = VersionedReader(spark, log)
    reader.read(mv).orderBy("kind").as[(String, Long, Long)].collect() shouldBe
      Array(("even", 15L, 240L), ("odd", 15L, 225L))

    // DV-delete EVERY odd row (group death) and half the evens
    DeletionVectors.delete(
      ctx, log, table, col("id") % 2 === 1, user, UpdateMessage("kill odds"))
    DeletionVectors.delete(
      ctx, log, table, col("id") % 4 === 0, user, UpdateMessage("thin evens"))
    val out = spark.sql("REFRESH MATERIALIZED VIEW mvc1.db.by_kind").collect()
    out.head.getString(0) shouldBe "incremental"
    // odd group died; evens: ids 2,6,10,...,30 (8 rows)
    reader.read(mv).orderBy("kind").as[(String, Long, Long)].collect() shouldBe
      Array(("even", 8L, 128L))

    // the MV is an ordinary versioned table: time travel to the full build
    val buildCommit = log.updates(mv.name).reverse(1).id // init, build, refresh
    reader.readAsOf(mv, buildCommit).orderBy("kind").as[(String, Long, Long)]
      .collect().map(_._1) shouldBe Array("even", "odd")
  }

  test("FULL refresh rebuilds from a source scan and lands the same state as incremental") {
    val (ctx, log, table) = setup("mvc2")
    (1L to 20L).map(i => Event(i, s"k${i % 4}", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvc2.db.mv2 LOCATION '${mvLoc()}'
         |AS SELECT kind, count(*) AS n, sum(id) AS sum_id
         |FROM mvc2.db.events WHERE id > 2 GROUP BY kind""".stripMargin)
    (21L to 25L).map(i => Event(i, s"k${i % 4}", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v2"))

    val mv = GraftTableCatalog.lookup("mvc2", TableName("db", "mv2")).get._2
    spark.sql("REFRESH MATERIALIZED VIEW mvc2.db.mv2 FULL").collect()
      .head.getString(0) shouldBe "full"
    val full = VersionedReader(spark, log).read(mv).orderBy("kind")
      .as[(String, Long, Long)].collect()
    // oracle by hand: ids 3..25, grouped by i%4, WHERE id > 2
    val expected = (3L to 25L).groupBy(i => s"k${i % 4}").toSeq.sortBy(_._1)
      .map { case (k, ids) => (k, ids.size.toLong, ids.sum) }
    full shouldBe expected
  }

  test("after RESTORE of the MV, incremental refresh re-anchors to the restored state") {
    val (ctx, log, table) = setup("mvc5")
    (1L to 10L).map(i => Event(i, "g", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvc5.db.mv5 LOCATION '${mvLoc()}'
         |AS SELECT kind, count(*) AS n, sum(id) AS sum_id
         |FROM mvc5.db.events GROUP BY kind""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvc5", TableName("db", "mv5")).get._2
    val builtCommit = log.currentCommit(mv.name)

    // source moves, MV refreshes (anchor advances past the build)
    DeletionVectors.delete(ctx, log, table, col("id") <= 3, user, UpdateMessage("d1"))
    spark.sql("REFRESH MATERIALIZED VIEW mvc5.db.mv5").collect()
      .head.getString(0) shouldBe "incremental"

    // the MV is RESTORED to the original build: its state reflects the
    // PRE-delete source, so the next refresh must re-apply the d1 deltas
    log.setCurrentVersion(mv.name, builtCommit) // RESTORE the MV
    DeletionVectors.delete(ctx, log, table, col("id") === 10, user, UpdateMessage("d2"))
    spark.sql("REFRESH MATERIALIZED VIEW mvc5.db.mv5").collect()
      .head.getString(0) shouldBe "incremental"
    // correct final state: ids 4..9 (d1 re-applied onto the restored
    // contents + d2) — the pre-fix behavior anchored at the rolled-back
    // refresh and silently skipped d1
    VersionedReader(spark, log).read(mv).as[(String, Long, Long)].collect() shouldBe
      Array(("g", 6L, (4L to 9L).sum))
  }

  test("non-maintainable shapes reject loudly at CREATE") {
    val (ctx, _, table) = setup("mvc3")
    (1L to 5L).map(i => Event(i, "a", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    def rejects(select: String, needle: String): Unit = {
      val e = intercept[Exception] {
        spark.sql(
          s"CREATE MATERIALIZED VIEW mvc3.db.bad LOCATION '${mvLoc()}' AS $select")
      }
      e.getMessage should include(needle)
      GraftTableCatalog.lookup("mvc3", TableName("db", "bad")) shouldBe None
    }
    rejects("SELECT kind, collect_list(id) AS a, count(*) AS n FROM mvc3.db.events GROUP BY kind",
      "not maintainable")
    rejects("SELECT kind, sum(id) AS s FROM mvc3.db.events GROUP BY kind",
      "count(*) is required")
    rejects("SELECT kind, count(DISTINCT id) AS n FROM mvc3.db.events GROUP BY kind",
      "DISTINCT")
    rejects("SELECT kind, count(*) AS n FROM mvc3.db.events WHERE rand() > 0.5 GROUP BY kind",
      "deterministic")
    rejects("SELECT count(*) AS n FROM mvc3.db.events e JOIN mvc3.db.events f ON e.id = f.id",
      "maintainable")
  }

  test("refresh applies the view's WHERE to the feed (filtered deltas only)") {
    val (ctx, log, table) = setup("mvc4")
    (1L to 10L).map(i => Event(i, "g", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvc4.db.mv4 LOCATION '${mvLoc()}'
         |AS SELECT kind, count(*) AS n, sum(id) AS sum_id
         |FROM mvc4.db.events WHERE id >= 5 GROUP BY kind""".stripMargin)
    // deletes BELOW the predicate must not change the MV; one above must
    DeletionVectors.delete(ctx, log, table, col("id") <= 2, user, UpdateMessage("below"))
    DeletionVectors.delete(ctx, log, table, col("id") === 9, user, UpdateMessage("above"))
    spark.sql("REFRESH MATERIALIZED VIEW mvc4.db.mv4").collect()
      .head.getString(0) shouldBe "incremental"
    val mv = GraftTableCatalog.lookup("mvc4", TableName("db", "mv4")).get._2
    VersionedReader(spark, log).read(mv).as[(String, Long, Long)].collect() shouldBe
      Array(("g", 5L, 5L + 6L + 7L + 8L + 10L))
  }

  test("avg/min/max maintain exactly under DV deletes and rewrites (re-scan path): incremental == full recompute") {
    val (ctx, log, table) = setup("mvc6")
    (1L to 40L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvc6.db.mv6 LOCATION '${mvLoc()}'
         |AS SELECT kind, count(*) AS n, avg(id) AS avg_id, min(id) AS min_id,
         |          max(id) AS max_id, sum(id) AS sum_id
         |FROM mvc6.db.events GROUP BY kind""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvc6", TableName("db", "mv6")).get._2

    // kill each group's current min and max plus scattered middles, then
    // insert fresh rows — exactly the shape no pure delta can repair
    DeletionVectors.delete(ctx, log, table,
      col("id").isin(1L, 2L, 39L, 40L) || col("id") % 5 === 0,
      user, UpdateMessage("dv: clip extremes"))
    (41L to 45L).map(i => Event(i, "odd", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v2: more odds"))

    MaterializedView.refresh(spark, "mvc6", mv, user)._3 shouldBe "incremental"

    val got = VersionedReader(spark, log).read(mv)
      .orderBy("kind").collect().map(_.toSeq)
    val expected = DeletionVectors.read(spark, log, table)
      .groupBy("kind")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.avg("id").as("avg_id"),
        org.apache.spark.sql.functions.min("id").as("min_id"),
        org.apache.spark.sql.functions.max("id").as("max_id"),
        org.apache.spark.sql.functions.sum("id").as("sum_id"))
      .orderBy("kind").collect().map(_.toSeq)
    got shouldBe expected
  }

  test("sum/min NULL-exactness: an all-null group stays NULL through insert-only and delete refreshes") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    spark.conf.set("spark.sql.catalog.mvc7", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("mvc7", log)
    val table = TableDefinition(
      TableName("db", "vals"),
      Files.createTempDirectory("graft_mv_mvc7").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    GraftTableCatalog.register("mvc7", table)
    Seq((1L, "g1", Option(5L), "2024-01-01"), (2L, "g2", Option.empty[Long], "2024-01-01"))
      .toDF("id", "kind", "v", "date")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvc7.db.mv7 LOCATION '${mvLoc()}'
         |AS SELECT kind, count(*) AS n, sum(v) AS sum_v, min(v) AS min_v
         |FROM mvc7.db.vals GROUP BY kind""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvc7", TableName("db", "mv7")).get._2
    val reader = VersionedReader(spark, log)
    def state(): Map[String, (Long, Option[Long], Option[Long])] =
      reader.read(mv).as[(String, Long, Option[Long], Option[Long])]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // full build: the all-null group's sum is NULL, not 0
    state()("g2") shouldBe ((1L, None, None))

    // insert-only refresh adding another null: STAYS NULL (delta path must
    // not coalesce the absent sum into a phantom 0)
    Seq((3L, "g2", Option.empty[Long], "2024-01-02")).toDF("id", "kind", "v", "date")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2"))
    MaterializedView.refresh(spark, "mvc7", mv, user)._3 shouldBe "incremental"
    state()("g2") shouldBe ((2L, None, None))

    // first non-null arrives: sum/min materialize
    Seq((4L, "g2", Option(7L), "2024-01-03")).toDF("id", "kind", "v", "date")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v3"))
    MaterializedView.refresh(spark, "mvc7", mv, user)._3 shouldBe "incremental"
    state()("g2") shouldBe ((3L, Some(7L), Some(7L)))

    // deleting the only non-null row returns the group to NULL (re-scan
    // path) while the untouched group passes through unchanged
    DeletionVectors.delete(ctx, log, table, col("v") === 7L,
      user, UpdateMessage("dv: drop the non-null"))
    MaterializedView.refresh(spark, "mvc7", mv, user)._3 shouldBe "incremental"
    state() shouldBe Map(
      "g1" -> ((1L, Some(5L), Some(5L))),
      "g2" -> ((2L, None, None)))
  }

  test("MV refresh across a source partition-evolution boundary refuses with the FULL remediation; FULL rebuilds") {
    val (ctx, log, table) = setup("mvc8")
    (1L to 20L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvc8.db.mv8 LOCATION '${mvLoc()}'
         |AS SELECT kind, count(*) AS n, sum(id) AS sum_id
         |FROM mvc8.db.events GROUP BY kind""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvc8", TableName("db", "mv8")).get._2

    // the source evolves its partitioning: the MV's anchor now sits in the
    // OLD era — the incremental feed cannot cross the boundary
    val evolved = PartitionEvolution.evolve(
      spark, ctx, table, PartitionSchema(List(PartitionColumn("kind"))), user)
    // NB: the table is now partitioned by kind — a new-era insert touching
    // an existing kind would REPLACE that partition (correct overwrite
    // semantics), so the fresh rows land in a brand-new kind
    Seq(Event(21, "new", "2024-02-02")).toDS()
      .versionedInsertInto(ctx, evolved, user, UpdateMessage("v2 new era"))

    val e = intercept[IllegalStateException] {
      MaterializedView.refresh(spark, "mvc8", mv, user)
    }
    e.getMessage should include("REFRESH ... FULL")

    // FULL rebuilds from a source scan of the new era and re-anchors
    MaterializedView.refresh(spark, "mvc8", mv, user, full = true)._3 shouldBe "full"
    VersionedReader(spark, log).read(mv).orderBy("kind")
      .as[(String, Long, Long)].collect() shouldBe
      Array(("even", 10L, (2L to 20L by 2).sum), ("new", 1L, 21L),
        ("odd", 10L, (1L to 19L by 2).sum))
    // and the NEXT incremental refresh (within the new era) works again:
    // the DV delete kills the 'new' group
    DeletionVectors.delete(ctx, log, evolved, col("id") === 21, user, UpdateMessage("dv"))
    MaterializedView.refresh(spark, "mvc8", mv, user)._3 shouldBe "incremental"
    VersionedReader(spark, log).read(mv).orderBy("kind")
      .as[(String, Long, Long)].collect() shouldBe
      Array(("even", 10L, (2L to 20L by 2).sum), ("odd", 10L, (1L to 19L by 2).sum))
  }

  test("NULL group keys are groups: insert-only and delete-triggered refreshes keep them exact") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    spark.conf.set("spark.sql.catalog.mvc9", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("mvc9", log)
    val table = TableDefinition(
      TableName("db", "nullkeys"),
      Files.createTempDirectory("graft_mv_mvc9").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    GraftTableCatalog.register("mvc9", table)
    // the GROUP column carries NULLs — GROUP BY makes them a real group
    Seq((1L, Option("g1"), Option(5L), "2024-01-01"),
        (2L, Option.empty[String], Option(7L), "2024-01-01"),
        (3L, Option.empty[String], Option(9L), "2024-01-01"))
      .toDF("id", "kind", "v", "date")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvc9.db.mv9 LOCATION '${mvLoc()}'
         |AS SELECT kind, count(*) AS n, sum(v) AS sum_v, min(v) AS min_v
         |FROM mvc9.db.nullkeys GROUP BY kind""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvc9", TableName("db", "mv9")).get._2
    val reader = VersionedReader(spark, log)
    def state(): Map[Option[String], (Long, Option[Long], Option[Long])] =
      reader.read(mv).as[(Option[String], Long, Option[Long], Option[Long])]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    state()(None) shouldBe ((2L, Some(16L), Some(7L)))

    // insert-only refresh into the NULL group: exactly one merged row
    Seq((4L, Option.empty[String], Option(1L), "2024-01-02"))
      .toDF("id", "kind", "v", "date")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2"))
    MaterializedView.refresh(spark, "mvc9", mv, user)._3 shouldBe "incremental"
    reader.read(mv).where(col("kind").isNull).count() shouldBe 1L // never duplicated
    state()(None) shouldBe ((3L, Some(17L), Some(1L)))

    // delete the NULL group's min: the re-scan path must find the group
    DeletionVectors.delete(ctx, log, table, col("v") === 1L, user, UpdateMessage("dv"))
    MaterializedView.refresh(spark, "mvc9", mv, user)._3 shouldBe "incremental"
    state() shouldBe Map(
      Some("g1") -> ((1L, Some(5L), Some(5L))),
      None -> ((2L, Some(16L), Some(7L))))
  }

  test("an MV over a column-mapped (renamed) source builds and refreshes under logical names") {
    val (ctx, log, table) = setup("mvc10")
    (1L to 12L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    // rename kind -> label: files keep the physical name, the view speaks
    // the LOGICAL one
    ColumnMapping.rename(spark, ctx, table, "kind", "label", user)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvc10.db.mv10 LOCATION '${mvLoc()}'
         |AS SELECT label, count(*) AS n, min(id) AS min_id
         |FROM mvc10.db.events GROUP BY label""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvc10", TableName("db", "mv10")).get._2
    val reader = VersionedReader(spark, log)
    reader.read(mv).orderBy("label").as[(String, Long, Long)].collect() shouldBe
      Array(("even", 6L, 2L), ("odd", 6L, 1L))

    // a DV delete of each group's min forces the re-scan path — which must
    // also resolve the logical name
    DeletionVectors.delete(ctx, log, table, col("id") <= 2, user, UpdateMessage("dv"))
    MaterializedView.refresh(spark, "mvc10", mv, user)._3 shouldBe "incremental"
    reader.read(mv).orderBy("label").as[(String, Long, Long)].collect() shouldBe
      Array(("even", 5L, 4L), ("odd", 5L, 3L))
  }
  // ---- star-schema (join) MVs (round 15) ----

  /** A snapshot dimension table registered beside the fact. */
  private def dimTable(cat: String, ctx: VersionContext, name: String): TableDefinition = {
    val d = TableDefinition(
      TableName("db", name),
      Files.createTempDirectory(s"graft_mvdim_$name").toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    ctx.init(d, user, UpdateMessage("init dim"))
    GraftTableCatalog.register(cat, d)
    d
  }

  test("a star-join MV builds, tracks fact inserts incrementally, and re-scans on fact deletes") {
    val (ctx, log, fact) = setup("mvj1")
    val dim = dimTable("mvj1", ctx, "kinds")
    Seq(("even", "E"), ("odd", "O")).toDF("kind", "label")
      .versionedInsertInto(ctx, dim, user, UpdateMessage("dims"))
    (1L to 20L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, fact, user, UpdateMessage("v1"))

    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvj1.db.by_label LOCATION '${mvLoc()}'
         |AS SELECT d.label, count(*) AS n, sum(f.id) AS sum_id, min(f.id) AS min_id
         |FROM mvj1.db.events f JOIN mvj1.db.kinds d ON f.kind = d.kind
         |GROUP BY d.label""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvj1", TableName("db", "by_label")).get._2
    val reader = VersionedReader(spark, log)
    reader.read(mv).orderBy("label").as[(String, Long, Long, Long)].collect() shouldBe
      Array(("E", 10L, 110L, 2L), ("O", 10L, 100L, 1L))

    // fact INSERTS: delta path (joined to the dims) — mode incremental
    (21L to 24L).map(i => Event(i, "even", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, fact, user, UpdateMessage("v2"))
    spark.sql("REFRESH MATERIALIZED VIEW mvj1.db.by_label")
      .collect().head.getString(0) shouldBe "incremental"
    reader.read(mv).orderBy("label").as[(String, Long, Long, Long)].collect() shouldBe
      Array(("E", 14L, 200L, 2L), ("O", 10L, 100L, 1L))

    // fact DV DELETE (removes the current min of O): re-scan path
    DeletionVectors.delete(
      ctx, log, fact, col("id") <= 3, user, UpdateMessage("dv: drop 1..3"))
    spark.sql("REFRESH MATERIALIZED VIEW mvj1.db.by_label")
      .collect().head.getString(0) shouldBe "incremental"
    val afterDelete = reader.read(mv).orderBy("label")
      .as[(String, Long, Long, Long)].collect()
    afterDelete shouldBe Array(("E", 13L, 198L, 4L), ("O", 8L, 96L, 5L))

    // incremental == FULL on the same state
    spark.sql("REFRESH MATERIALIZED VIEW mvj1.db.by_label FULL")
    reader.read(mv).orderBy("label")
      .as[(String, Long, Long, Long)].collect() shouldBe afterDelete
  }

  test("a DIM change re-anchors the star MV with a FULL rebuild (never a stale-join delta)") {
    val (ctx, log, fact) = setup("mvj2")
    val dim = dimTable("mvj2", ctx, "kinds")
    Seq(("even", "E"), ("odd", "O")).toDF("kind", "label")
      .versionedInsertInto(ctx, dim, user, UpdateMessage("dims"))
    (1L to 10L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, fact, user, UpdateMessage("v1"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvj2.db.mvj LOCATION '${mvLoc()}'
         |AS SELECT d.label, count(*) AS n
         |FROM mvj2.db.events f JOIN mvj2.db.kinds d ON f.kind = d.kind
         |GROUP BY d.label""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvj2", TableName("db", "mvj")).get._2

    // relabel the dim (snapshot overwrite) — the fact is untouched
    Seq(("even", "EVEN"), ("odd", "ODD")).toDF("kind", "label")
      .versionedInsertInto(ctx, dim, user, UpdateMessage("relabel"))
    spark.sql("REFRESH MATERIALIZED VIEW mvj2.db.mvj")
      .collect().head.getString(0) shouldBe "full"
    VersionedReader(spark, log).read(mv).orderBy("label")
      .as[(String, Long)].collect() shouldBe Array(("EVEN", 5L), ("ODD", 5L))

    // quiet fact + quiet dims → no-op
    spark.sql("REFRESH MATERIALIZED VIEW mvj2.db.mvj")
      .collect().head.getString(0) shouldBe "no-op"
  }

  test("star MV: WHERE over a dim attribute filters both the build and the feed") {
    val (ctx, log, fact) = setup("mvj3")
    val dim = dimTable("mvj3", ctx, "kinds")
    Seq(("even", "keep"), ("odd", "drop")).toDF("kind", "label")
      .versionedInsertInto(ctx, dim, user, UpdateMessage("dims"))
    (1L to 10L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, fact, user, UpdateMessage("v1"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvj3.db.mvw LOCATION '${mvLoc()}'
         |AS SELECT f.kind, count(*) AS n
         |FROM mvj3.db.events f JOIN mvj3.db.kinds d ON f.kind = d.kind
         |WHERE d.label = 'keep' GROUP BY f.kind""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvj3", TableName("db", "mvw")).get._2
    val reader = VersionedReader(spark, log)
    reader.read(mv).as[(String, Long)].collect() shouldBe Array(("even", 5L))

    Seq(Event(11, "even", "2024-01-02"), Event(12, "odd", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, fact, user, UpdateMessage("v2"))
    spark.sql("REFRESH MATERIALIZED VIEW mvj3.db.mvw")
      .collect().head.getString(0) shouldBe "incremental"
    reader.read(mv).as[(String, Long)].collect() shouldBe Array(("even", 6L))
  }

  test("star MV: racing refreshes still conflict via the MV rebase commit") {
    val (ctx, log, fact) = setup("mvj4")
    val dim = dimTable("mvj4", ctx, "kinds")
    Seq(("even", "E"), ("odd", "O")).toDF("kind", "label")
      .versionedInsertInto(ctx, dim, user, UpdateMessage("dims"))
    (1L to 10L).map(i => Event(i, if (i % 2 == 0) "even" else "odd", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, fact, user, UpdateMessage("v1"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvj4.db.mvr LOCATION '${mvLoc()}'
         |AS SELECT d.label, count(*) AS n
         |FROM mvj4.db.events f JOIN mvj4.db.kinds d ON f.kind = d.kind
         |GROUP BY d.label""".stripMargin)
    val mv = GraftTableCatalog.lookup("mvj4", TableName("db", "mvr")).get._2
    Seq(Event(11, "even", "2024-01-02")).toDS()
      .versionedInsertInto(ctx, fact, user, UpdateMessage("v2"))

    // a competing refresh lands inside this refresh's race window
    MaterializedView.interleaveForTest = () => {
      MaterializedView.interleaveForTest = () => ()
      MaterializedView.refresh(spark, "mvj4", mv, user)
      ()
    }
    try {
      intercept[TableVersions.ConcurrentWriteException] {
        MaterializedView.refresh(spark, "mvj4", mv, user)
      }
    } finally MaterializedView.interleaveForTest = () => ()
    // the winner's state is consistent
    VersionedReader(spark, log).read(mv).orderBy("label")
      .as[(String, Long)].collect() shouldBe Array(("E", 6L), ("O", 5L))
  }

  test("non-maintainable join shapes reject loudly at CREATE") {
    val (ctx, log, fact) = setup("mvj5")
    val dim = dimTable("mvj5", ctx, "kinds")
    Seq(("even", "E")).toDF("kind", "label")
      .versionedInsertInto(ctx, dim, user, UpdateMessage("dims"))
    Seq(Event(1, "even", "2024-01-01")).toDS()
      .versionedInsertInto(ctx, fact, user, UpdateMessage("v1"))
    def rejects(sql: String, needle: String): Unit =
      (the[IllegalArgumentException] thrownBy spark.sql(sql))
        .getMessage should include(needle)

    rejects(
      s"""CREATE MATERIALIZED VIEW mvj5.db.bad1 LOCATION '${mvLoc()}'
         |AS SELECT d.label, count(*) AS n
         |FROM mvj5.db.events f LEFT JOIN mvj5.db.kinds d ON f.kind = d.kind
         |GROUP BY d.label""".stripMargin,
      "INNER")
    rejects(
      s"""CREATE MATERIALIZED VIEW mvj5.db.bad2 LOCATION '${mvLoc()}'
         |AS SELECT d.label, count(*) AS n
         |FROM mvj5.db.events f CROSS JOIN mvj5.db.kinds d
         |GROUP BY d.label""".stripMargin,
      "INNER")
    rejects(
      s"""CREATE MATERIALIZED VIEW mvj5.db.bad3 LOCATION '${mvLoc()}'
         |AS SELECT d.label, count(*) AS n
         |FROM mvj5.db.events f JOIN mvj5.db.kinds d
         |GROUP BY d.label""".stripMargin,
      "ON condition")
  }
}
