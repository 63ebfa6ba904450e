package graft.spark

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.GeneratedColumns.GeneratedColumn
import graft.spark.VersionContext.DatasetVersionOps

/** Torn-write crash safety for the six JSON metadata sidecars.
  *
  * The failure this guards against: a writer that dies between truncating
  * the sidecar and finishing the new content leaves torn JSON, and every
  * later metadata resolution throws until the file is hand-repaired. With
  * `AtomicSidecar` the crash point (temp file written, publish move not
  * yet done — injected via the `beforePublish` seam) must leave the
  * PREVIOUS state fully readable.
  */
class AtomicSidecarSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val user = UserId("atomic-test")
  private def conf = spark.sessionState.newHadoopConf()

  private def freshTable(name: String): (VersionContext, InMemoryTableVersions, TableDefinition) = {
    val log = new InMemoryTableVersions
    val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
    val table = TableDefinition(
      TableName("test", name),
      Files.createTempDirectory(s"graft_$name").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(table, user, UpdateMessage("init"))
    (ctx, log, table)
  }

  private def sidecarPath(table: TableDefinition, rel: String): Path =
    new Path(Partition.normalizedDir(table.location).toString + rel)

  /** Simulate a crash mid-update of `p`: the new content is staged but the
    * process dies before publish. Returns nothing; `p` must be unchanged. */
  private def crashWrite(p: Path): Unit = {
    val boom = intercept[RuntimeException] {
      AtomicSidecar.writeUtf8(conf, p, "{\"torn\":", () => throw new RuntimeException("crash"))
    }
    boom.getMessage shouldBe "crash"
  }

  private def readText(p: Path): String = {
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  // ---------------- helper-level properties ----------------

  test("writeUtf8 creates a new file and round-trips through the checksummed local FS") {
    val dir = Files.createTempDirectory("graft_atomic_new")
    val p = new Path(dir.toUri.toString + "/state.json")
    AtomicSidecar.writeUtf8(conf, p, """{"v":1}""")
    readText(p) shouldBe """{"v":1}"""
  }

  test("writeUtf8 atomically replaces a file written by the old in-place writer (stale .crc dropped)") {
    val dir = Files.createTempDirectory("graft_atomic_crc")
    val p = new Path(dir.toUri.toString + "/state.json")
    // old-style write through the CHECKSUMMED local FS: leaves state.json + .state.json.crc
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write("""{"v":1}""".getBytes("UTF-8")) finally out.close()
    Files.exists(java.nio.file.Paths.get(dir.toString, ".state.json.crc")) shouldBe true

    AtomicSidecar.writeUtf8(conf, p, """{"v":2}""")
    // a read through the SAME checksummed FS must not fail verification
    readText(p) shouldBe """{"v":2}"""
  }

  test("a crash between staging and publish leaves the previous content intact") {
    val dir = Files.createTempDirectory("graft_atomic_crash")
    val p = new Path(dir.toUri.toString + "/state.json")
    AtomicSidecar.writeUtf8(conf, p, """{"v":1}""")
    crashWrite(p)
    readText(p) shouldBe """{"v":1}"""
    // and the writer recovers on retry: the orphaned temp never blocks
    AtomicSidecar.writeUtf8(conf, p, """{"v":3}""")
    readText(p) shouldBe """{"v":3}"""
  }

  // ---------------- per-module crash tests ----------------

  test("column mapping survives a torn update: previous rename still resolves") {
    val (ctx, log, table) = freshTable("atomic_map")
    Seq((1L, "k1", "2024-01-01")).toDF("id", "kind", "date")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    ColumnMapping.rename(spark, ctx, table, "kind", "category", user)
    crashWrite(sidecarPath(table, "_column_mapping.json"))
    val st = ColumnMapping.stateAt(spark, log, table, None)
    st.isDefined shouldBe true
    st.get.entries.exists(e => e.logical == "category" && e.physical == "kind") shouldBe true
  }

  test("constraints survive a torn update") {
    val (ctx, _, table) = freshTable("atomic_cons")
    Constraints.add(spark, ctx, table, Constraints.notNull("id"), user)
    crashWrite(sidecarPath(table, s"_constraints/${table.name.fullyQualifiedName}.json"))
    Constraints.list(spark, table).map(_.name) shouldBe List("id_not_null")
  }

  test("generated columns survive a torn update") {
    val (ctx, _, table) = freshTable("atomic_gen")
    GeneratedColumns.add(spark, ctx, table, GeneratedColumn("y", "substring(date, 1, 4)"), user)
    crashWrite(sidecarPath(table, s"_generated/${table.name.fullyQualifiedName}.json"))
    GeneratedColumns.list(spark, table).map(_.column) shouldBe List("y")
  }

  test("identity declaration survives a torn update") {
    val (ctx, _, table) = freshTable("atomic_id")
    IdentityColumns.declare(spark, ctx, table, "id", user)
    crashWrite(sidecarPath(table, s"_identity/${table.name.fullyQualifiedName}.json"))
    IdentityColumns.declared(spark, table) shouldBe Some("id")
  }

  test("partition-scheme era registry survives a torn update") {
    val (_, log, table) = freshTable("atomic_evo")
    val anchor = log.currentCommit(table.name)
    PartitionEvolution.cloneStateTo(
      spark, table,
      PartitionEvolution.SchemeState("src-commit", List("region"), None),
      anchor, table.name)
    crashWrite(sidecarPath(table, "_partitioning.json"))
    val st = PartitionEvolution.states(spark, table)
    st.map(_.columns) shouldBe List(List("region"))
  }

  test("materialized-view definition survives a torn update") {
    val dir = Files.createTempDirectory("graft_atomic_mv")
    val mv = TableDefinition(
      TableName("test", "atomic_mv"), dir.toUri,
      PartitionSchema.snapshot, FileFormat.Parquet)
    AtomicSidecar.writeUtf8(
      conf, sidecarPath(mv, "_mv.json"),
      """{"source":"graft.test.src","group":["g"],"aggs":[{"fn":"count","input":"*","alias":"cnt"}]}""")
    crashWrite(sidecarPath(mv, "_mv.json"))
    val d = MaterializedView.readDef(spark, mv)
    d.sourceParts shouldBe Seq("graft", "test", "src")
    d.aggs.map(_.alias) shouldBe Seq("cnt")
  }
}
