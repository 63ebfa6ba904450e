package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, struct}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** Generalized SQL DML shapes (round 18):
  *
  *  - MERGE ON with DIFFERING key names (`ON t.id = s.src_id`) and with
  *    RESIDUAL conjuncts beyond the equi keys (one-sided filters, non-equi
  *    comparisons) — both route through the conditional engine, where the
  *    residual rides the clause join with SQL ON semantics: a pair failing
  *    it is NOT matched (target falls to NOT MATCHED BY SOURCE, source row
  *    to NOT MATCHED). With a residual the ambiguity check moves after the
  *    join (per-target-row match counts) so duplicate source keys
  *    disambiguated by the residual are legal.
  *  - Nested struct-field assignment (`SET meta.lang = 'en'`) in UPDATE
  *    and MERGE SET — folded into one struct rebuild per root column.
  *  - Copy-on-write UPDATE of a PARTITION column: rows migrate between
  *    partitions in one commit (source ∪ destination partitions
  *    rewritten, emptied sources removed atomically).
  */
class DmlGeneralizedSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._
  private val user = UserId("dml-gen")

  private val log = new InMemoryTableVersions
  private val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
  spark.conf.set("spark.sql.catalog.graftdg", classOf[GraftTableCatalog].getName)
  GraftTableCatalog.bind("graftdg", log)

  private def mkTable(name: String, partitioned: Boolean = true): TableDefinition = {
    val t = TableDefinition(
      TableName("db", name),
      Files.createTempDirectory(s"graft_dg_$name").toUri,
      if (partitioned) PartitionSchema(List(PartitionColumn("date")))
      else PartitionSchema.snapshot,
      FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftdg", t)
    t
  }

  test("MERGE ON with differing key names joins target.id to source.src_id") {
    val t = mkTable("diffkeys")
    Seq(Event(1, "old", "2024-01-01"), Event(2, "old", "2024-01-01"),
      Event(3, "old", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    Seq((2L, "new", "2024-01-01"), (9L, "new", "2024-01-02"))
      .toDF("src_id", "kind", "date").createOrReplaceTempView("dg_src1")

    spark.sql(
      """MERGE INTO graftdg.db.diffkeys t USING dg_src1 s ON t.id = s.src_id
        |WHEN MATCHED THEN UPDATE SET kind = s.kind
        |WHEN NOT MATCHED THEN INSERT (id, kind, date) VALUES (s.src_id, s.kind, s.date)
        |""".stripMargin)

    val rows = DeletionVectors.read(spark, log, t)
      .select(col("id"), col("kind")).as[(Long, String)].collect().sortBy(_._1)
    rows shouldBe Array((1L, "old"), (2L, "new"), (3L, "old"), (9L, "new"))
  }

  test("MERGE ON residual conjunct: pairs failing it are NOT matched (SQL ON semantics)") {
    val t = mkTable("residual")
    Seq(Event(1, "old", "2024-01-01"), Event(2, "old", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    // source hits both ids, but the residual one-sided filter s.kind = 'y'
    // only lets id=1 match; the id=2 source row must INSERT (not update)
    Seq((1L, "y", "2024-01-01"), (2L, "n", "2024-01-02"))
      .toDF("id", "flag", "date").createOrReplaceTempView("dg_src2")

    spark.sql(
      """MERGE INTO graftdg.db.residual t USING dg_src2 s
        |ON t.id = s.id AND s.flag = 'y'
        |WHEN MATCHED THEN UPDATE SET kind = s.flag
        |WHEN NOT MATCHED THEN INSERT (id, kind, date) VALUES (s.id, concat('ins_', s.flag), s.date)
        |""".stripMargin)

    val rows = DeletionVectors.read(spark, log, t)
      .select(col("id"), col("kind"), col("date"))
      .as[(Long, String, String)].collect().sortBy(r => (r._1, r._2))
    // id=1 updated; id=2 target row untouched AND a second id=2 row
    // inserted into 2024-01-02 — exactly what the ON condition says
    rows shouldBe Array(
      (1L, "y", "2024-01-01"),
      (2L, "ins_n", "2024-01-02"),
      (2L, "old", "2024-01-01"))
  }

  test("MERGE residual disambiguates duplicate source keys; true ambiguity still refuses") {
    val t = mkTable("residual_dup")
    Seq(Event(5, "old", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    // two source rows share id=5 — WITHOUT the residual this refuses at
    // the pre-check; WITH it only the rank=1 row matches
    Seq((5L, 1, "2024-01-01"), (5L, 2, "2024-01-01"))
      .toDF("id", "rank", "date").createOrReplaceTempView("dg_src3")

    spark.sql(
      """MERGE INTO graftdg.db.residual_dup t USING dg_src3 s
        |ON t.id = s.id AND s.rank = 1
        |WHEN MATCHED THEN UPDATE SET kind = concat('r', cast(s.rank as string))
        |""".stripMargin)
    DeletionVectors.read(spark, log, t).select(col("kind"))
      .as[String].collect() shouldBe Array("r1")

    // both source rows pass the residual → one target row matches twice →
    // ambiguous, refuse (the post-join check)
    Seq((5L, 1, "2024-01-01"), (5L, 1, "2024-01-01"))
      .toDF("id", "rank", "date").createOrReplaceTempView("dg_src3b")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO graftdg.db.residual_dup t USING dg_src3b s
          |ON t.id = s.id AND s.rank = 1
          |WHEN MATCHED THEN UPDATE SET kind = 'x'
          |""".stripMargin)
    }
    e.getMessage should include("ambiguous")
  }

  test("MERGE ON without any equi key refuses loudly") {
    val t = mkTable("nokeys")
    Seq(Event(1, "old", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    Seq((1L, "2024-01-01")).toDF("id", "date").createOrReplaceTempView("dg_src4")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO graftdg.db.nokeys t USING dg_src4 s ON t.id < s.id
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    e.getMessage should include("equi key")
  }

  test("UPDATE of a nested struct field rebuilds the struct, other fields intact (CoW + MOR)") {
    val t = mkTable("nested_upd")
    Seq((1L, "en", 0.5, "2024-01-01"), (2L, "de", 0.7, "2024-01-01"))
      .toDF("id", "lang", "score", "date")
      .select(col("id"), struct(col("lang"), col("score")).as("meta"), col("date"))
      .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))

    // copy-on-write: one nested field
    spark.sql("UPDATE graftdg.db.nested_upd SET meta.lang = 'fr' WHERE id = 1")
    val afterCow = DeletionVectors.read(spark, log, t)
      .select(col("id"), col("meta.lang"), col("meta.score"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    afterCow shouldBe Array((1L, "fr", 0.5), (2L, "de", 0.7))

    // merge-on-read: two nested fields of the SAME root in one statement
    val foldBefore = log.currentVersion(t.name)
    SessionConf.withConf(spark, "spark.graft.dml.mergeOnRead", "true") {
      spark.sql(
        "UPDATE graftdg.db.nested_upd SET meta.lang = 'it', meta.score = meta.score + 1 WHERE id = 2")
    }
    log.currentVersion(t.name) shouldBe foldBefore // vectors + overlay only
    val afterMor = DeletionVectors.read(spark, log, t)
      .select(col("id"), col("meta.lang"), col("meta.score"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    afterMor shouldBe Array((1L, "fr", 0.5), (2L, "it", 1.7))

    // whole-column + nested on the same root is ambiguous
    val e = intercept[Exception] {
      spark.sql(
        "UPDATE graftdg.db.nested_upd SET meta = named_struct('lang', 'x', 'score', 0.0), meta.lang = 'y'")
    }
    e.getMessage.toLowerCase should include("conflicting")
  }

  test("MERGE WHEN MATCHED SET of a nested field") {
    val t = mkTable("nested_merge")
    Seq((1L, "en", 1.0, "2024-01-01"))
      .toDF("id", "lang", "score", "date")
      .select(col("id"), struct(col("lang"), col("score")).as("meta"), col("date"))
      .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    Seq((1L, "sv", "2024-01-01")).toDF("id", "newlang", "date")
      .createOrReplaceTempView("dg_src5")

    spark.sql(
      """MERGE INTO graftdg.db.nested_merge t USING dg_src5 s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET meta.lang = s.newlang
        |""".stripMargin)
    DeletionVectors.read(spark, log, t)
      .select(col("meta.lang"), col("meta.score"))
      .as[(String, Double)].collect() shouldBe Array(("sv", 1.0))
  }

  test("copy-on-write UPDATE of a partition column migrates rows in ONE commit") {
    val t = mkTable("part_migrate")
    Seq(
      Event(1, "a", "2024-01-01"), Event(2, "b", "2024-01-01"),
      Event(3, "c", "2024-01-02"), Event(4, "d", "2024-01-03"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    val before = log.currentVersion(t.name) match {
      case PartitionedTableVersion(pvs) => pvs
      case other                        => fail(s"unexpected $other")
    }
    val commitsBefore = log.updates(t.name).size
    val preCommit = log.currentCommit(t.name)

    // move id=1 from 01-01 into EXISTING 01-02, and ALL of 01-03 into a
    // NEW partition 01-04 (01-03 empties → removed in the same commit)
    spark.sql(
      "UPDATE graftdg.db.part_migrate SET date = '2024-01-02' WHERE id = 1")
    spark.sql(
      "UPDATE graftdg.db.part_migrate SET date = '2024-01-04', kind = 'moved' WHERE date = '2024-01-03'")

    log.updates(t.name).size shouldBe commitsBefore + 2 // one commit per statement
    val after = log.currentVersion(t.name) match {
      case PartitionedTableVersion(pvs) => pvs
      case other                        => fail(s"unexpected $other")
    }
    def p(d: String) = Partition(ColumnValue(PartitionColumn("date"), d))
    after.keySet shouldBe Set(p("2024-01-01"), p("2024-01-02"), p("2024-01-04"))
    // destination partition re-versioned (its rows were carried + joined
    // by the migrant); the emptied source is GONE
    after(p("2024-01-02")) should not be before(p("2024-01-02"))
    after.contains(p("2024-01-03")) shouldBe false

    val rows = DeletionVectors.read(spark, log, t)
      .select(col("id"), col("kind"), col("date"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    rows shouldBe Array(
      (1L, "a", "2024-01-02"), (2L, "b", "2024-01-01"),
      (3L, "c", "2024-01-02"), (4L, "moved", "2024-01-04"))

    // time travel: the pre-migration commit still reads the old layout
    VersionedReader(spark, log).readAsOf(t, preCommit)
      .where(col("id") === 1L).select(col("date"))
      .as[String].collect() shouldBe Array("2024-01-01")

    // NULL destination refuses
    val e = intercept[Exception] {
      spark.sql("UPDATE graftdg.db.part_migrate SET date = NULL WHERE id = 2")
    }
    e.getMessage should include("partition")
  }

  test("partition-migration UPDATE runs ONE matched file pass; probe and rewrite read the persisted scoped scan") {
    val t = mkTable("part_migrate_scans")
    Seq(
      Event(1, "a", "2024-01-01"), Event(2, "b", "2024-01-01"),
      Event(3, "c", "2024-01-02"), Event(4, "d", "2024-01-03"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))

    val plans = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { plans.add(qe.executedPlan.toString); () }
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.sql(
        "UPDATE graftdg.db.part_migrate_scans SET date = '2024-01-02' WHERE id = 1")
      // listener events dispatch async — wait for the stream to go quiet
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        if (plans.size == last) stable += 1 else { stable = 0; last = plans.size }
      }
    } finally spark.listenerManager.unregister(listener)

    val marker = "part_migrate_scans"
    val mine = new java.util.ArrayList(plans)
    val snap = (0 until mine.size).map(mine.get).filter(_.contains(marker)).toList
    // the single-pass scope: exactly ONE execution file-scans the table
    // directly (the matched src+dst pair pass) — never the old
    // probe/dst/src/carried quartet of full DV-aware scans
    val direct = snap.filter(p => p.contains("FileScan") && !p.contains("InMemoryTableScan"))
    withClue(s"direct file-scan plans:\n${direct.mkString("\n---\n")}\n") {
      direct.size shouldBe 1
    }
    // the carried-partition probe and the final rewrite both read the
    // PERSISTED scoped scan instead of re-scanning files
    snap.count(_.contains("InMemoryTableScan")) should be >= 2
  }
}
