package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.spark.TestSpark

/** [[SrpBucket]] and [[DotProduct]]: bit-identity with the interpreted
  * higher-order-function formulations they replaced in the ANN/near-dup hot
  * paths, codegen participation, and null/edge semantics. */
class VectorOpsSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  /** The pre-native HOF formulation of the portable SRP bucket (what
    * `Pipeline.lshBucket` used to build, verbatim), over a pre-cast
    * double-array column `dvec`. */
  private def hofBucket(nPlanes: Int): Column = {
    def planeWeight(p: Int): String =
      s"(CASE WHEN (1 + $p * 64 + d) * (1 + $p * 64 + d) * 2654435761 % 1000000007 % 2 = 1" +
        " THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)"
    (0 until nPlanes).map { p =>
      val dot = expr(
        s"""aggregate(
           |  zip_with(dvec, sequence(0, size(dvec) - 1), (x, d) -> x * ${planeWeight(p)}),
           |  cast(0 as double), (a, x) -> a + x)""".stripMargin)
      when(dot > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce(_ + _)
  }

  test("srp_bucket matches the HOF formulation on every fixture vector (2 and 8 planes)") {
    val emb = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("dvec", expr("transform(embedding, x -> cast(x as double))"))
    for (planes <- Seq(2, 8)) {
      val mismatches = emb
        .select(
          GraftFunctions.srpBucket(col("embedding"), planes).as("native"),
          hofBucket(planes).as("viaHof"))
        .where(col("native") =!= col("viaHof"))
        .count()
      mismatches shouldBe 0L
    }
  }

  test("dot_product matches the HOF formulation bit-for-bit on fixture pairs") {
    val emb = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("dvec", expr("transform(embedding, x -> cast(x as double))"))
    val pairs = emb.select(col("vec_id"), col("embedding"), col("dvec"))
      .where(col("vec_id") < 20)
      .crossJoin(
        emb.select(col("embedding").as("e2"), col("dvec").as("d2")).where(col("vec_id") < 20))
    val mismatches = pairs
      .select(
        GraftFunctions.dotProduct(col("embedding"), col("e2")).as("native"),
        expr("aggregate(zip_with(dvec, d2, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)")
          .as("viaHof"))
      .where(col("native") =!= col("viaHof"))
      .count()
    mismatches shouldBe 0L
  }

  test("srp_bucket runs inside whole-stage codegen over a real scan") {
    val emb = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val df = emb.select(GraftFunctions.srpBucket(col("embedding"), 8).as("bucket"))
    df.queryExecution.executedPlan.toString should include("*(1) Project [srp_bucket")
    val buckets = df.collect().map(_.getLong(0))
    all(buckets) should (be >= 0L and be < 256L)
    buckets.distinct.length should be > 1 // planes actually separate vectors
  }

  test("srp_bucket null semantics match the HOF stack: null input/element → bucket 0") {
    val df = Seq[(Long, Option[Array[Option[Float]]])](
      (1L, Some(Array(Some(1.0f), Some(-2.0f)))),
      (2L, None),                                 // null vector
      (3L, Some(Array(Some(1.0f), None)))         // null element
    ).toDF("id", "v")
    val out = df.select(col("id"), GraftFunctions.srpBucket(col("v"), 8).as("b")).collect()
    out.find(_.getLong(0) == 2L).get.getLong(1) shouldBe 0L
    out.find(_.getLong(0) == 3L).get.getLong(1) shouldBe 0L
    out.foreach(_.isNullAt(1) shouldBe false)
  }

  test("dot_product null semantics: null input, null element, length mismatch → null") {
    val df = Seq[(Long, Option[Array[Option[Float]]], Option[Array[Option[Float]]])](
      (1L, Some(Array(Some(1.0f), Some(2.0f))), Some(Array(Some(3.0f), Some(4.0f)))),
      (2L, None, Some(Array(Some(1.0f)))),                            // null input
      (3L, Some(Array(Some(1.0f), None)), Some(Array(Some(1.0f), Some(1.0f)))), // null element
      (4L, Some(Array(Some(1.0f))), Some(Array(Some(1.0f), Some(2.0f))))        // length mismatch
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), GraftFunctions.dotProduct(col("a"), col("b")).as("d")).collect()
    out.find(_.getLong(0) == 1L).get.getDouble(1) shouldBe 11.0
    Seq(2L, 3L, 4L).foreach { id =>
      out.find(_.getLong(0) == id).get.isNullAt(1) shouldBe true
    }
  }

  test("interpreted eval matches codegen for srp_bucket (literal fold path)") {
    // a local relation folds through ConvertToLocalRelation → interpreted
    // eval; the parquet-scan test above exercises codegen. Same vectors
    // through both must agree.
    val vecs = Seq(
      Array(0.5f, -1.5f, 2.25f, -0.125f),
      Array(-3.0f, 3.0f, -3.0f, 3.0f))
    val local = vecs.map(v => Tuple1(v)).toDF("v")
      .select(GraftFunctions.srpBucket(col("v"), 8).as("b")).collect().map(_.getLong(0))
    val viaScan = {
      val p = java.nio.file.Files.createTempDirectory("srp").toString
      vecs.map(v => Tuple1(v)).toDF("v").write.mode("overwrite").parquet(p)
      val out = spark.read.parquet(p)
        .select(GraftFunctions.srpBucket(col("v"), 8).as("b")).collect().map(_.getLong(0))
      out
    }
    local.sorted shouldBe viaScan.sorted
  }

  test("srp_bucket and dot_product match the HOFs on adversarial float values") {
    // NaN poisons a plane's dot (NaN > 0 is false → bit 0) and the HOF
    // stack behaves identically; infinities and denormals must also agree
    val vecs: Seq[Array[Float]] = Seq(
      Array(Float.NaN, 1.0f, -1.0f, 2.0f),
      Array(Float.PositiveInfinity, -1e30f, 1e30f, 0.0f),
      Array(Float.NegativeInfinity, Float.MaxValue, Float.MinPositiveValue, -0.0f),
      Array(0.0f, -0.0f, 1e-40f, -1e-40f), // denormals
      Array.fill(64)(1e19f)                // large homogeneous
    )
    // literal relations constant-fold to interpreted eval; write through
    // parquet so the comparison exercises the codegen path
    val p = java.nio.file.Files.createTempDirectory("srpadv").toString
    vecs.map(Tuple1(_)).toDF("v").write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
      .withColumn("dvec", expr("transform(v, x -> cast(x as double))"))
    val bucketRows = df.select(
      GraftFunctions.srpBucket(col("v"), 8).as("native"),
      hofBucket(8).as("viaHof")).collect()
    bucketRows.foreach(r => r.getLong(0) shouldBe r.getLong(1))
    val dotRows = df.select(
      GraftFunctions.dotProduct(col("v"), col("v")).as("native"),
      expr("aggregate(zip_with(dvec, dvec, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)")
        .as("viaHof")).collect()
    dotRows.foreach { r =>
      // NaN == NaN is false; compare raw bits so NaN agreement passes too
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("SQL registration: dot_product is callable from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT dot_product(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d").collect()
    r.head.getDouble(0) shouldBe 11.0
  }
}
