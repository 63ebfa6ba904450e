package graft.spark

import java.nio.file.Files

import scala.io.Source

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** `GENERATE symlink_format_manifest FOR TABLE t` ([[SymlinkManifest]]):
  * the manifest lists exactly the CURRENT version's data files (stale
  * version dirs excluded), re-generation tracks new commits, and live
  * DVs / overlay rows refuse with the remedy named. */
class SymlinkManifestSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._
  private val user = UserId("manifest")

  private val log = new InMemoryTableVersions
  private val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
  spark.conf.set("spark.sql.catalog.graftsm", classOf[GraftTableCatalog].getName)
  GraftTableCatalog.bind("graftsm", log)

  private def mkTable(name: String): TableDefinition = {
    val t = TableDefinition(
      TableName("db", name),
      Files.createTempDirectory(s"graft_sm_$name").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftsm", t)
    t
  }

  private def manifestFiles(t: TableDefinition): Map[String, Seq[String]] = {
    val root = new java.io.File(
      new java.net.URI(Partition.normalizedDir(t.location).toString +
        SymlinkManifest.DirName))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).filter(_.getName == "manifest").map { f =>
      val rel = root.toPath.relativize(f.toPath.getParent).toString
      val src = Source.fromFile(f)
      try rel -> src.getLines().toList.filter(_.nonEmpty)
      finally src.close()
    }.toMap
  }

  test("manifest lists exactly the current version's files; regeneration tracks commits") {
    val t = mkTable("sm_t")
    (1L to 20L).map(i => Event(i, "v1", s"2024-01-0${i % 2 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    // second commit rewrites date=2024-01-01 — its v1 dir goes stale but
    // stays on disk for time travel
    (101L to 110L).map(i => Event(i, "v2", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v2"))

    val rows = spark.sql(
      "GENERATE symlink_format_manifest FOR TABLE graftsm.db.sm_t").collect()
    rows.map(_.getString(0)).sorted shouldBe
      Array("date=2024-01-01", "date=2024-01-02")
    rows.foreach(_.getInt(1) should be > 0)

    val m = manifestFiles(t)
    // reading ONLY the manifest-listed files reproduces the current state
    val listed = m.values.flatten.toSeq
    val viaManifest = spark.read.parquet(listed: _*)
    viaManifest.count() shouldBe 20L // 10 surviving v1 rows + 10 v2 rows
    viaManifest.where(col("kind") === "v2").count() shouldBe 10L
    // the stale v1 dir of the rewritten partition is on disk but absent
    // from the manifest (URI rendering normalized: file:/ vs file:///)
    def norm(s: String) = s.replaceFirst("^file:/+", "file:/")
    val reader = VersionedReader(spark, log)
    listed.map(norm).toSet shouldBe reader.read(t).inputFiles.map(norm).toSet

    // a third commit moves a partition; re-generate follows
    (201L to 205L).map(i => Event(i, "v3", "2024-01-02"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v3"))
    spark.sql("GENERATE symlink_format_manifest FOR TABLE graftsm.db.sm_t").collect()
    manifestFiles(t).values.flatten.toSeq.map(norm).toSet shouldBe
      reader.read(t).inputFiles.map(norm).toSet
  }

  test("live deletion vectors and overlay rows refuse with the remedy named") {
    val t = mkTable("sm_refuse")
    (1L to 10L).map(i => Event(i, "x", s"2024-01-0${i % 2 + 1}"))
      .toDS().versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    DeletionVectors.delete(ctx, log, t, col("id") === 3L, user, UpdateMessage("dv"))
    val e1 = intercept[Exception] {
      spark.sql("GENERATE symlink_format_manifest FOR TABLE graftsm.db.sm_refuse").collect()
    }
    e1.getMessage should include("deletion vectors")
    e1.getMessage should include("OPTIMIZE")

    val t2 = mkTable("sm_refuse2")
    (1L to 10L).map(i => Event(i, "x", s"2024-01-0${i % 2 + 1}"))
      .toDS().versionedInsertInto(ctx, t2, user, UpdateMessage("v1"))
    RowOverlay.append(
      Seq(Event(99L, "o", "2024-01-01")).toDF(), ctx, t2, user, UpdateMessage("mor"))
    val e2 = intercept[Exception] {
      spark.sql("GENERATE symlink_format_manifest FOR TABLE graftsm.db.sm_refuse2").collect()
    }
    e2.getMessage should include("overlay")

    // a column mapping means files carry stale physical names — refuse
    val t3 = mkTable("sm_refuse3")
    (1L to 5L).map(i => Event(i, "x", "2024-01-01"))
      .toDS().versionedInsertInto(ctx, t3, user, UpdateMessage("v1"))
    spark.sql("ALTER TABLE graftsm.db.sm_refuse3 RENAME COLUMN kind TO label")
    val e3 = intercept[Exception] {
      spark.sql("GENERATE symlink_format_manifest FOR TABLE graftsm.db.sm_refuse3").collect()
    }
    e3.getMessage should include("column mapping")
  }
}
