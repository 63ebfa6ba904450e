package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}

/** NESTED-FIELD schema evolution: `ALTER TABLE … ADD COLUMN s.x T` widens
  * a struct column in place (nullable, appended at the parent's end); old
  * files read the new field as a typed NULL; TIME TRAVEL reads the struct
  * shape of the ADDRESSED commit ([[SchemaStates]] at-or-before
  * resolution — the Delta snapshot-schema contract); MERGE autoMerge
  * widens struct-typed source columns the same way
  * ([[StructEvolution]]). */
class NestedEvolutionSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._
  private val user = UserId("nest")

  private val log = new InMemoryTableVersions
  private val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
  spark.conf.set("spark.sql.catalog.graftnest", classOf[GraftTableCatalog].getName)
  GraftTableCatalog.bind("graftnest", log)

  private def metaType(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.schema.fields.find(_.name == "meta").get.dataType
      .asInstanceOf[StructType].fieldNames.toSeq

  test("nested ADD: old files read NULL, time travel reads the addressed commit's struct shape") {
    val loc = Files.createTempDirectory("graft_nested").toUri
    spark.sql(
      s"""CREATE TABLE graftnest.db.docs (
         |  id BIGINT, meta STRUCT<src: STRING>, date STRING)
         |USING parquet PARTITIONED BY (date) LOCATION '$loc'""".stripMargin)
    spark.sql(
      """INSERT INTO graftnest.db.docs
        |SELECT id, named_struct('src', concat('s', id)) AS meta, '2024-01-01' AS date
        |FROM range(1, 4)""".stripMargin)
    val tn = TableName("db", "docs")
    val v1 = log.currentCommit(tn)

    spark.sql("ALTER TABLE graftnest.db.docs ADD COLUMN meta.lang STRING")
    val postAlter = log.currentCommit(tn)
    postAlter should not be v1
    log.updates(tn).head.message.content shouldBe "ALTER TABLE ADD COLUMNS (meta.lang)"

    // current reads: widened struct, old rows NULL in meta.lang
    val cur = spark.table("graftnest.db.docs")
    metaType(cur) shouldBe Seq("src", "lang")
    cur.where(col("meta.lang").isNotNull).count() shouldBe 0L
    cur.select("meta.src").as[String].collect().sorted shouldBe Array("s1", "s2", "s3")

    // new writes carry the field; mixed reads keep NULLs for old files
    spark.sql(
      """INSERT INTO graftnest.db.docs
        |SELECT id, named_struct('src', concat('s', id), 'lang', 'en') AS meta,
        |       '2024-01-02' AS date
        |FROM range(10, 12)""".stripMargin)
    val mixed = spark.table("graftnest.db.docs")
    mixed.count() shouldBe 5L
    mixed.where(col("meta.lang") === "en").count() shouldBe 2L
    mixed.where(col("date") === "2024-01-01" && col("meta.lang").isNull)
      .count() shouldBe 3L

    // TIME TRAVEL: the addressed commit's struct shape — v1 predates the
    // evolution, so meta has NO lang field there
    val atV1 = spark.sql(
      s"SELECT * FROM graftnest.db.docs VERSION AS OF '${v1.id}'")
    metaType(atV1) shouldBe Seq("src")
    atV1.count() shouldBe 3L
    // …while the post-alter commit (pre-second-insert) declares the wide
    // shape and NULL-fills it over the v1 files
    val atAlter = spark.sql(
      s"SELECT * FROM graftnest.db.docs VERSION AS OF '${postAlter.id}'")
    metaType(atAlter) shouldBe Seq("src", "lang")
    atAlter.where(col("meta.lang").isNotNull).count() shouldBe 0L
    atAlter.count() shouldBe 3L

    // refusals: non-struct parent, duplicate field, unknown parent
    intercept[Exception](spark.sql(
      "ALTER TABLE graftnest.db.docs ADD COLUMN id.x STRING"))
      .getMessage should include("not a struct")
    intercept[Exception](spark.sql(
      "ALTER TABLE graftnest.db.docs ADD COLUMN meta.src STRING"))
      .getMessage should include("already exists")
    intercept[Exception](spark.sql(
      "ALTER TABLE graftnest.db.docs ADD COLUMN nosuch.x STRING"))
      .getMessage.toLowerCase should include("cannot be resolved")
  }

  test("MERGE autoMerge widens a struct source column; kept rows conform with typed NULLs") {
    val t = TableDefinition(
      TableName("db", "mdocs"),
      Files.createTempDirectory("graft_nested_merge").toUri,
      PartitionSchema(List(PartitionColumn("date"))), FileFormat.Parquet)
    ctx.init(t, user, UpdateMessage("init"))
    GraftTableCatalog.register("graftnest", t)
    spark.sql(
      """SELECT id, named_struct('src', concat('s', id)) AS meta,
        |       '2024-01-01' AS date
        |FROM range(1, 5)""".stripMargin)
      .createOrReplaceTempView("nest_v1")
    import VersionContext.DatasetVersionOps
    spark.table("nest_v1").versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
    val preMerge = log.currentCommit(t.name)

    // source struct carries an EXTRA nested field 'lang': id 2 updates,
    // id 100 inserts — both in the partition holding kept rows 1,3,4
    spark.sql(
      """SELECT id, named_struct('src', concat('n', id), 'lang', 'de') AS meta,
        |       '2024-01-01' AS date
        |FROM (SELECT 2L AS id UNION ALL SELECT 100L AS id)""".stripMargin)
      .createOrReplaceTempView("nest_src")
    SessionConf.withConf(spark, "spark.graft.dml.autoMergeSchema", "true") {
      spark.sql(
        """MERGE INTO graftnest.db.mdocs t USING nest_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    log.updates(t.name).map(_.message.content)
      .exists(_.startsWith("MERGE SCHEMA EVOLUTION WIDEN COLUMNS (meta)")) shouldBe true

    val after = spark.table("graftnest.db.mdocs")
    metaType(after) shouldBe Seq("src", "lang")
    after.count() shouldBe 5L
    after.where(col("id") === 2L).select("meta.lang").as[String].head() shouldBe "de"
    after.where(col("id") === 100L).select("meta.src").as[String].head() shouldBe "n100"
    // kept rows: carried src values, NULL lang (conform, not cast)
    after.where(col("id") === 3L).select("meta.src").as[String].head() shouldBe "s3"
    after.where(col("id").isin(1L, 3L, 4L) && col("meta.lang").isNull)
      .count() shouldBe 3L

    // time travel to the pre-merge commit: the narrow struct shape
    val atPre = spark.sql(
      s"SELECT * FROM graftnest.db.mdocs VERSION AS OF '${preMerge.id}'")
    metaType(atPre) shouldBe Seq("src")
    atPre.count() shouldBe 4L
  }

  test("shallow clone carries nested-evolution shapes; later evolutions stay isolated") {
    val loc = Files.createTempDirectory("graft_nested_clone").toUri
    spark.sql(
      s"""CREATE TABLE graftnest.db.cdocs (
         |  id BIGINT, meta STRUCT<src: STRING>, date STRING)
         |USING parquet PARTITIONED BY (date) LOCATION '$loc'""".stripMargin)
    spark.sql(
      """INSERT INTO graftnest.db.cdocs
        |SELECT id, named_struct('src', concat('s', id)) AS meta, '2024-01-01' AS date
        |FROM range(1, 4)""".stripMargin)
    spark.sql("ALTER TABLE graftnest.db.cdocs ADD COLUMN meta.lang STRING")
    spark.sql(
      """INSERT INTO graftnest.db.cdocs
        |SELECT id, named_struct('src', concat('s', id), 'lang', 'en') AS meta,
        |       '2024-01-02' AS date FROM range(10, 12)""".stripMargin)

    spark.sql("CREATE TABLE graftnest.db.cdocs_fork SHALLOW CLONE graftnest.db.cdocs")
    val fork = spark.table("graftnest.db.cdocs_fork")
    metaType(fork) shouldBe Seq("src", "lang")
    fork.count() shouldBe 5L
    fork.where(col("meta.lang") === "en").count() shouldBe 2L
    // the clone carries its OWN schema-state file: time travel to its
    // state commit reads the cloned shapes
    val forkCommit = log.currentCommit(TableName("db", "cdocs_fork"))
    metaType(spark.sql(
      s"SELECT * FROM graftnest.db.cdocs_fork VERSION AS OF '${forkCommit.id}'")) shouldBe
      Seq("src", "lang")

    // isolation: an evolution on the SOURCE never leaks into the clone…
    spark.sql("ALTER TABLE graftnest.db.cdocs ADD COLUMN meta.srcside STRING")
    metaType(spark.table("graftnest.db.cdocs")) shouldBe Seq("src", "lang", "srcside")
    metaType(spark.table("graftnest.db.cdocs_fork")) shouldBe Seq("src", "lang")
    // …and one on the CLONE never leaks back
    spark.sql("ALTER TABLE graftnest.db.cdocs_fork ADD COLUMN meta.forkside STRING")
    metaType(spark.table("graftnest.db.cdocs_fork")) shouldBe Seq("src", "lang", "forkside")
    metaType(spark.table("graftnest.db.cdocs")) shouldBe Seq("src", "lang", "srcside")
  }

  test("StructEvolution algebra: addField, isWidening, conform null-safety") {
    import org.apache.spark.sql.types._
    val narrow = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(StructField("src", StringType))))))
    val wide = StructEvolution.addField(narrow, Seq("meta", "lang"), StringType)
    wide.fields(1).dataType.asInstanceOf[StructType].fieldNames shouldBe
      Array("src", "lang")
    StructEvolution.isWidening(
      narrow.fields(1).dataType, wide.fields(1).dataType) shouldBe true
    StructEvolution.isWidening(
      wide.fields(1).dataType, narrow.fields(1).dataType) shouldBe false
    // a NULL struct stays NULL through conform (not a struct of NULLs)
    val df = Seq((1L, Some("a")), (2L, None)).toDF("id", "src")
      .selectExpr("id",
        "CASE WHEN src IS NOT NULL THEN named_struct('src', src) END AS meta")
    val lifted = df.select(col("id"), StructEvolution.conform(
      col("meta"),
      df.schema.fields(1).dataType,
      wide.fields(1).dataType).as("meta"))
    lifted.where(col("id") === 2L && col("meta").isNull).count() shouldBe 1L
    lifted.where(col("id") === 1L).select("meta.src").as[String].head() shouldBe "a"
    lifted.where(col("id") === 1L && col("meta.lang").isNull).count() shouldBe 1L
    // arrays of structs widen element-wise
    StructEvolution.isWidening(
      ArrayType(narrow.fields(1).dataType), ArrayType(wide.fields(1).dataType)) shouldBe true
  }
}
