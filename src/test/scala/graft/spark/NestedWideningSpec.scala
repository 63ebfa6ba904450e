package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit, named_struct, sum}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.VersionContext.DatasetVersionOps

/** NESTED-FIELD TYPE WIDENING ([[ColumnMapping.widenPath]]) — `ALTER
  * COLUMN s.x TYPE bigint` as a path-keyed mapping entry: metadata-only
  * at depth (old files keep the narrow struct leaf and upcast at scan;
  * post-widen writes store the wide leaf; time travel at-or-before the
  * widen reads the narrow struct). */
class NestedWideningSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session

  private val user = UserId("nwiden-test")

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

  private def narrowBatch(spark: org.apache.spark.sql.SparkSession, n: Int, date: String) = {
    import spark.implicits._
    (1 to n).toDF("id")
      .select(
        col("id").cast("long").as("id"),
        named_struct(
          lit("cnt"), col("id").cast("int"),
          lit("score"), (col("id") * 1.5).cast("float"),
          lit("tag"), lit("t")).as("meta"),
        lit(date).as("date"))
  }

  private def metaType(df: org.apache.spark.sql.DataFrame): StructType =
    df.schema("meta").dataType.asInstanceOf[StructType]

  test("nested widen is metadata-only: narrow old struct leaves upcast, wide writes land, time travel stays narrow") {
    val (ctx, log, table) = freshTable("nw_core")
    narrowBatch(spark, 10, "2024-01-01")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: narrow"))
    val preWiden = log.currentCommit(table.name)
    val v1Files = VersionedReader(spark, log).read(table).inputFiles.toSet

    ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "cnt"), "bigint", user)
    ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "score"), "double", user)
    log.updates(table.name).map(_.message.content) should contain(
      "ALTER TABLE ALTER COLUMN meta.cnt TYPE bigint")

    // post-widen write carries values only the wide leaf types can hold
    spark.range(1)
      .select(
        lit(100L).as("id"),
        named_struct(
          lit("cnt"), lit(6000000000L),
          lit("score"), lit(1.0e40),
          lit("tag"), lit("wide")).as("meta"),
        lit("2024-01-02").as("date"))
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2: wide"))

    val mapped = ColumnMapping.read(spark, log, table)
    metaType(mapped)("cnt").dataType.catalogString shouldBe "bigint"
    metaType(mapped)("score").dataType.catalogString shouldBe "double"
    // the widen rewrote NO files: v1's files serve both generations
    v1Files.subsetOf(mapped.inputFiles.toSet) shouldBe true
    mapped.count() shouldBe 11L
    // values from BOTH generations aggregate correctly across mixed widths
    mapped.agg(sum(col("meta.cnt"))).head().getLong(0) shouldBe (55L + 6000000000L)
    mapped.where(col("meta.cnt") === 6000000000L).count() shouldBe 1L
    mapped.where(col("meta.cnt") === 3).count() shouldBe 1L

    // time travel BEFORE the widen reads the narrow struct (at-or-before)
    val old = ColumnMapping.read(spark, log, table, Some(preWiden))
    metaType(old)("cnt").dataType.catalogString shouldBe "int"
    metaType(old)("score").dataType.catalogString shouldBe "float"
    old.count() shouldBe 10L
  }

  test("nested widen refuses narrowing, lossy changes, unknown paths, and non-struct parents") {
    val (ctx, log, table) = freshTable("nw_refuse")
    narrowBatch(spark, 5, "2024-01-01")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "cnt"), "bigint", user)
    // narrowing back refuses
    an[IllegalArgumentException] should be thrownBy
      ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "cnt"), "int", user)
    // lossy change refuses
    an[IllegalArgumentException] should be thrownBy
      ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "tag"), "bigint", user)
    // unknown field refuses
    an[IllegalArgumentException] should be thrownBy
      ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "nope"), "bigint", user)
    // non-struct parent refuses
    an[IllegalArgumentException] should be thrownBy
      ColumnMapping.widenPath(spark, ctx, table, Seq("id", "x"), "bigint", user)
    // partition-column head refuses
    an[IllegalArgumentException] should be thrownBy
      ColumnMapping.widenPath(spark, ctx, table, Seq("date", "x"), "bigint", user)
    // idempotent re-widen refuses (already bigint)
    an[IllegalArgumentException] should be thrownBy
      ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "cnt"), "bigint", user)
    // int -> double IS an allowed lossless widen, even after int -> bigint
    // was recorded for the sibling
    ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "score"), "double", user)
    ()
  }

  test("nested widen composes with nested rename: physical path stays frozen, wide type follows the logical name") {
    val (ctx, log, table) = freshTable("nw_rename")
    narrowBatch(spark, 6, "2024-01-01")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))

    ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "cnt"), "bigint", user)
    ColumnMapping.renameNested(spark, ctx, table, Seq("meta", "cnt"), "count", user)

    val mapped = ColumnMapping.read(spark, log, table)
    metaType(mapped).fieldNames should contain("count")
    metaType(mapped)("count").dataType.catalogString shouldBe "bigint"
    mapped.agg(sum(col("meta.count"))).head().getLong(0) shouldBe 21L

    // writes speak the logical name; the narrow-int batch upcasts to the
    // wide physical leaf
    spark.range(1)
      .select(
        lit(50L).as("id"),
        named_struct(
          lit("count"), lit(7).cast("int"),
          lit("score"), lit(2.0f),
          lit("tag"), lit("r")).as("meta"),
        lit("2024-01-02").as("date"))
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2"))
    val after = ColumnMapping.read(spark, log, table)
    after.agg(sum(col("meta.count"))).head().getLong(0) shouldBe 28L
    metaType(after)("count").dataType.catalogString shouldBe "bigint"

    // widen ANOTHER field addressed by its current logical path
    ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "score"), "double", user)
    metaType(ColumnMapping.read(spark, log, table))("score")
      .dataType.catalogString shouldBe "double"
  }

  test("merge-on-read overlay rows written before a nested widen cast to the wide struct on read") {
    val (ctx, log, table) = freshTable("nw_overlay")
    narrowBatch(spark, 8, "2024-01-01")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    // overlay rows land with the NARROW struct (pre-widen)
    RowOverlay.append(
      narrowBatch(spark, 3, "2024-01-01").withColumn("id", col("id") + 100),
      ctx, table, user, UpdateMessage("overlay narrow"))

    ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "cnt"), "bigint", user)

    // post-widen overlay rows carry a wide value
    RowOverlay.append(
      spark.range(1).select(
        lit(999L).as("id"),
        named_struct(
          lit("cnt"), lit(7000000000L),
          lit("score"), lit(0.5f),
          lit("tag"), lit("o")).as("meta"),
        lit("2024-01-01").as("date")),
      ctx, table, user, UpdateMessage("overlay wide"))

    val mapped = ColumnMapping.read(spark, log, table)
    metaType(mapped)("cnt").dataType.catalogString shouldBe "bigint"
    mapped.count() shouldBe 12L
    mapped.agg(sum(col("meta.cnt"))).head().getLong(0) shouldBe
      ((1L to 8L).sum + (1L to 3L).sum + 7000000000L)
  }

  test("TYPE widening reaches ARRAY elements: arr.element and arr.element.x") {
    import org.apache.spark.sql.functions.{array, explode}
    val (ctx, log, table) = freshTable("nw_array")
    def batch(ids: Range, cast: String, extra: Long, date: String) = {
      import spark.implicits._
      ids.toDF("i").select(
        col("i").cast("long").as("id"),
        array((col("i") + extra).cast(cast), lit(1).cast(cast)).as("xs"),
        array(named_struct(
          lit("cnt"), (col("i") + extra).cast(cast),
          lit("tag"), lit("t"))).as("frames"),
        lit(date).as("date"))
    }
    batch(1 to 5, "int", 0L, "2024-01-01")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: narrow arrays"))
    val preWiden = log.currentCommit(table.name)

    ColumnMapping.widenPath(spark, ctx, table, Seq("xs", "element"), "bigint", user)
    ColumnMapping.widenPath(
      spark, ctx, table, Seq("frames", "element", "cnt"), "bigint", user)

    // wide generation: values only bigint holds
    batch(6 to 6, "long", 8000000000L, "2024-01-02")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2: wide arrays"))

    val mapped = ColumnMapping.read(spark, log, table)
    mapped.schema("xs").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.catalogString shouldBe "bigint"
    mapped.schema("frames").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[StructType]("cnt").dataType.catalogString shouldBe "bigint"
    // both generations aggregate across the mixed widths
    mapped.select(explode(col("xs")).as("x")).agg(sum(col("x")))
      .head().getLong(0) shouldBe ((1L to 5L).sum + 5L + 8000000006L + 1L)
    mapped.select(explode(col("frames")).as("f")).agg(sum(col("f.cnt")))
      .head().getLong(0) shouldBe ((1L to 5L).sum + 8000000006L)

    // time travel at-or-before the widen reads the narrow element types
    val old = ColumnMapping.read(spark, log, table, Some(preWiden))
    old.schema("xs").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.catalogString shouldBe "int"

    // unaddressable segments refuse
    an[IllegalArgumentException] should be thrownBy
      ColumnMapping.widenPath(spark, ctx, table, Seq("xs", "nope"), "bigint", user)
    ()
  }

  test("TYPE widening reaches MAP keys and values: m.key / m.value") {
    import org.apache.spark.sql.functions.{explode, map_from_arrays, array}
    val (ctx, log, table) = freshTable("nw_map")
    def batch(ids: Range, cast: String, extra: Long, date: String) = {
      import spark.implicits._
      ids.toDF("i").select(
        col("i").cast("long").as("id"),
        map_from_arrays(
          array((col("i") + extra).cast(cast)),
          array((col("i") * 10 + extra).cast(cast))).as("m"),
        lit(date).as("date"))
    }
    batch(1 to 4, "int", 0L, "2024-01-01")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: narrow map"))
    val preWiden = log.currentCommit(table.name)

    ColumnMapping.widenPath(spark, ctx, table, Seq("m", "key"), "bigint", user)
    ColumnMapping.widenPath(spark, ctx, table, Seq("m", "value"), "bigint", user)

    batch(5 to 5, "long", 7000000000L, "2024-01-02")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v2: wide map"))

    val mapped = ColumnMapping.read(spark, log, table)
    val mt = mapped.schema("m").dataType.asInstanceOf[org.apache.spark.sql.types.MapType]
    mt.keyType.catalogString shouldBe "bigint"
    mt.valueType.catalogString shouldBe "bigint"
    mapped.select(explode(col("m")).as(Seq("k", "v")))
      .agg(sum(col("k")), sum(col("v"))).head() match {
      case r =>
        r.getLong(0) shouldBe ((1L to 4L).sum + 7000000005L)
        r.getLong(1) shouldBe ((1L to 4L).map(_ * 10).sum + 7000000050L)
    }

    // time travel at-or-before the widen reads the narrow map types
    ColumnMapping.read(spark, log, table, Some(preWiden))
      .schema("m").dataType.asInstanceOf[org.apache.spark.sql.types.MapType]
      .keyType.catalogString shouldBe "int"
  }

  test("change feed across a nested widen speaks the to-state's wide struct for both generations") {
    val (ctx, log, table) = freshTable("nw_feed")
    narrowBatch(spark, 6, "2024-01-01")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    val v1 = log.currentCommit(table.name)

    ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "cnt"), "bigint", user)
    // a WIDE overlay insert and a DV delete of a NARROW row inside the range
    RowOverlay.append(
      spark.range(1).select(
        lit(500L).as("id"),
        named_struct(
          lit("cnt"), lit(9000000000L),
          lit("score"), lit(1.0f),
          lit("tag"), lit("o")).as("meta"),
        lit("2024-01-01").as("date")),
      ctx, table, user, UpdateMessage("overlay wide"))
    DeletionVectors.delete(
      ctx, log, table, col("id") === 2, user, UpdateMessage("dv"))
    val head = log.currentCommit(table.name)

    val feed = ChangeFeed.read(spark, log, table, Some(v1), head)
    metaType(feed)("cnt").dataType.catalogString shouldBe "bigint"
    val ins = feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Insert)
    ins.count() shouldBe 1L
    ins.select(col("meta.cnt")).head().getLong(0) shouldBe 9000000000L
    val del = feed.where(col(ChangeFeed.ChangeTypeCol) === ChangeFeed.Delete)
    del.count() shouldBe 1L
    // the deleted narrow-generation row upcasts into the wide feed schema
    del.select(col("meta.cnt")).head().getLong(0) shouldBe 2L
  }

  test("SQL ALTER COLUMN s.x TYPE widens the nested field; scans, DML and time travel serve the right width") {
    val (ctx, log, table) = freshTable("nw_sql")
    spark.conf.set(
      "spark.sql.catalog.graftnw", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("graftnw", log)
    narrowBatch(spark, 10, "2024-01-01")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: narrow"))
    GraftTableCatalog.register("graftnw", table,
      Some(VersionedReader(spark, log).read(table).schema))
    val name = "graftnw.test.nw_sql"
    val preWiden = log.currentCommit(table.name)

    spark.sql(s"ALTER TABLE $name ALTER COLUMN meta.cnt TYPE BIGINT")
    // the declared relation serves the wide nested type
    metaType(spark.table(name))("cnt").dataType.catalogString shouldBe "bigint"
    // an insert beyond int range lands and reads back
    spark.sql(
      s"INSERT INTO $name SELECT 100L, named_struct('cnt', 6000000000L, " +
        "'score', CAST(0.5 AS FLOAT), 'tag', 'w'), '2024-01-02'")
    spark.sql(s"SELECT sum(meta.cnt) FROM $name")
      .head().getLong(0) shouldBe (55L + 6000000000L)

    // DML over the widened state: DELETE hides narrow-generation rows
    spark.sql(s"DELETE FROM $name WHERE meta.cnt <= 5")
    spark.sql(s"SELECT sum(meta.cnt) FROM $name")
      .head().getLong(0) shouldBe (40L + 6000000000L)

    // time travel BEFORE the widen reads the narrow struct
    metaType(spark.sql(s"SELECT * FROM $name VERSION AS OF '${preWiden.id}'"))(
      "cnt").dataType.catalogString shouldBe "int"

    // narrowing refuses through SQL too
    intercept[Exception](
      spark.sql(s"ALTER TABLE $name ALTER COLUMN meta.cnt TYPE INT"))
    ()
  }

  test("a mixed ALTER failing after a TYPE widen leaves the widen unapplied too") {
    val (ctx, log, table) = freshTable("nw_atomic")
    spark.conf.set(
      "spark.sql.catalog.graftnwa", classOf[GraftTableCatalog].getName)
    GraftTableCatalog.bind("graftnwa", log)
    narrowBatch(spark, 5, "2024-01-01")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1: narrow"))
    GraftTableCatalog.register("graftnwa", table,
      Some(VersionedReader(spark, log).read(table).schema))

    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    val catalog = spark.sessionState.catalogManager.catalog("graftnwa")
      .asInstanceOf[GraftTableCatalog]
    val ident = Identifier.of(Array("test"), "nw_atomic")
    val head = log.currentCommit(table.name)

    // the widen validates fine but the LATER change in the same batch
    // fails (duplicate column) — the widen must NOT have committed: no
    // mapping state, no audit commit, declared type still narrow
    intercept[Exception] {
      catalog.alterTable(ident,
        TableChange.updateColumnType(
          Array("meta", "cnt"), org.apache.spark.sql.types.LongType),
        TableChange.addColumn(
          Array("id"), org.apache.spark.sql.types.StringType))
    }
    log.currentCommit(table.name) shouldBe head
    ColumnMapping.hasMapping(spark, log, table, None) shouldBe false
    metaType(spark.table("graftnwa.test.nw_atomic"))("cnt")
      .dataType.catalogString shouldBe "int"

    // an INVALID widen (lossy) in a mixed batch refuses inside the fold
    // with the same nothing-applied outcome
    intercept[Exception] {
      catalog.alterTable(ident,
        TableChange.updateColumnType(
          Array("meta", "tag"), org.apache.spark.sql.types.LongType))
    }
    log.currentCommit(table.name) shouldBe head

    // a clean widen-only batch still lands
    catalog.alterTable(ident,
      TableChange.updateColumnType(
        Array("meta", "cnt"), org.apache.spark.sql.types.LongType))
    metaType(spark.table("graftnwa.test.nw_atomic"))("cnt")
      .dataType.catalogString shouldBe "bigint"
    ColumnMapping.hasMapping(spark, log, table, None) shouldBe true
  }

  test("MERGE over a nested-widened table aligns kept rows and a narrow source upcasts") {
    val (ctx, log, table) = freshTable("nw_merge")
    narrowBatch(spark, 6, "2024-01-01")
      .versionedInsertInto(ctx, table, user, UpdateMessage("v1"))
    ColumnMapping.widenPath(spark, ctx, table, Seq("meta", "cnt"), "bigint", user)

    // source carries a NARROW struct (int cnt) plus one wide row
    val src = narrowBatch(spark, 2, "2024-01-01")
      .withColumn("id", col("id") + 4) // ids 5,6 -> matched, updated
      .unionByName(spark.range(1).select(
        lit(50L).as("id"),
        named_struct(
          lit("cnt"), lit(8000000000L),
          lit("score"), lit(9.0f),
          lit("tag"), lit("m")).as("meta"),
        lit("2024-01-01").as("date")))
    Merge.mergeInto(ctx, log, table, src, Seq("id"), user, UpdateMessage("merge"))

    val mapped = ColumnMapping.read(spark, log, table)
    metaType(mapped)("cnt").dataType.catalogString shouldBe "bigint"
    mapped.count() shouldBe 7L
    // kept 1..4 keep cnt=id; matched 5,6 take source cnt 1,2; new row wide
    mapped.agg(sum(col("meta.cnt"))).head().getLong(0) shouldBe
      ((1L + 2L + 3L + 4L) + (1L + 2L) + 8000000000L)
  }
}
