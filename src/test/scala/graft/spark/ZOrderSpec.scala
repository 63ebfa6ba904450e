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

  test("size-capped z-order: TARGET splits a hot partition to ~target files, still clustered") {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", "zorder_sized"),
      Files.createTempDirectory("graft_spec_zorder_sz").toUri,
      PartitionSchema(List(PartitionColumn("bucket"))),
      FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))

    // one HOT partition (64× the rows of the cold one), fragmented
    val rows = (for (x <- 0 until 256; y <- 0 until 256) yield (x, y, "hot")) ++
      (for (x <- 0 until 32; y <- 0 until 32) yield (x, y, "cold"))
    rows.toDF("x", "y", "bucket").repartition(8)
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: fragmented"))

    def partFiles(name: String): Seq[java.nio.file.Path] = {
      val pvs = log.currentVersion(table.name) match {
        case PartitionedTableVersion(m) => m
        case other                      => fail(s"unexpected $other")
      }
      val (p, v) = pvs.find(_._1.columnValues.head.value == name).get
      val dir = Paths.get(table.location)
        .resolve(SparkPaths.escapedPartitionPath(p)).resolve(v.label)
      val out = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
      Files.list(dir).iterator()
        .forEachRemaining(f =>
          if (f.getFileName.toString.startsWith("part-")) out += f)
      out.toSeq
    }

    // target = ~1/4 of the hot partition's current bytes → the hot
    // partition must split to >1 file; the cold one stays a single file
    val hotBytes = partFiles("hot").map(Files.size(_)).sum
    ZOrder.zorderCompact(
      spark, ctx, table, user, UpdateMessage("v2: zordered sized"),
      zorderCols = Seq("x", "y"), targetBytes = Some(hotBytes / 4))

    val hot = partFiles("hot")
    hot.size should be >= 3
    partFiles("cold").size shouldBe 1

    // clustering survives the size cap: MOST hot files keep both spreads
    // bounded (a z-segment that crosses a top-level quadrant boundary is
    // legitimately wide on one dimension — the range sampler cuts by
    // bytes, not by quadrant; a linear sort would leave y full-width,
    // 255, in EVERY file)
    val spreads = hot.map { p =>
      val pts = spark.read.parquet(p.toString)
        .selectExpr("x", "y").as[(Int, Int)].collect()
      val sx = pts.map(_._1); val sy = pts.map(_._2)
      math.max(sx.max - sx.min, sy.max - sy.min)
    }
    spreads.count(_ <= 160) should be >= (hot.size + 1) / 2

    // row-identity: the sized rewrite is row-invisible
    VersionedReader(spark, log).read(table)
      .selectExpr("x", "y", "bucket").count() shouldBe rows.size
  }
}
