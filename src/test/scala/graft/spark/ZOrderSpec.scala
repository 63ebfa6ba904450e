package graft.spark

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

case class Point(x: Int, y: Int)

class ZOrderSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("zorder-test")

  test("zvalue interleaves normalized bits (x→even, y→odd positions)") {
    import org.apache.spark.sql.functions.col
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 2), (3, 3)).toDF("x", "y")
    val z = ZOrder.zvalue(Seq((col("x"), 0.0, 3.0), (col("y"), 0.0, 3.0)), bits = 2)
    df.select(col("x"), col("y"), z.as("z")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap shouldBe
      Map((0, 0) -> 0L, (1, 0) -> 1L, (0, 1) -> 2L, (1, 1) -> 3L, (2, 2) -> 12L, (3, 3) -> 15L)
  }

  test("z-order compaction bounds every file's spread on BOTH dimensions") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "zorder_snap"),
      Files.createTempDirectory("graft_spec_zorder").toUri,
      PartitionSchema.snapshot,
      FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))

    // a full 32×32 grid, written in scrambled order across 8 fragments
    val grid = for (x <- 0 until 32; y <- 0 until 32) yield Point(x, y)
    grid.sortBy(p => (p.x * 37 + p.y * 101) % 257).toDS()
      .repartition(8)
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: scrambled"))

    ZOrder.zorderCompact(
      spark, ctx, table, user, UpdateMessage("v2: zordered"),
      zorderCols = Seq("x", "y"), numFiles = 4)

    // the new version must be row-identical
    val reader = VersionedReader(spark, log)
    reader.read(table).as[Point].collect().sortBy(p => (p.x, p.y)) shouldBe
      grid.sortBy(p => (p.x, p.y)).toArray

    val versionDir = log.currentVersion(table.name) match {
      case SnapshotTableVersion(v) => Paths.get(table.location).resolve(v.label)
      case other                   => fail(s"unexpected $other")
    }
    val files = Files.list(versionDir).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val parts = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    files.forEachRemaining(p => if (p.getFileName.toString.startsWith("part-")) parts += p)
    parts.size shouldBe 4

    // every file owns a compact Z-curve segment: with 4 files over a 32×32
    // grid the ideal tiles are 16×16 quadrants; allow range-sampler slack.
    // A LINEAR sort by x would leave y full-width (spread 31) in every file.
    parts.foreach { p =>
      val stats = spark.read.parquet(p.toString).as[Point].collect()
      val sx = stats.map(_.x); val sy = stats.map(_.y)
      (sx.max - sx.min) should be <= 20
      (sy.max - sy.min) should be <= 20
    }
  }
}
