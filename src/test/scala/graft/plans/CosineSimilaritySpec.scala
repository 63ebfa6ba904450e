package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.spark.TestSpark

class CosineSimilaritySpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))
  ).toDF("id", "a", "b")

  test("matches the higher-order-function formulation bit-for-bit") {
    val hof =
      expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (p, q) -> p + q)") /
        (sqrt(expr("aggregate(a, cast(0 as double), (p, x) -> p + cast(x as double) * cast(x as double))")) *
          sqrt(expr("aggregate(b, cast(0 as double), (p, x) -> p + cast(x as double) * cast(x as double))")))
    val rows = vecs
      .select(col("id"), GraftFunctions.cosineSim(col("a"), col("b")).as("native"), hof.as("viaHof"))
      .collect()
    rows.foreach(r => r.getDouble(1) shouldBe r.getDouble(2))
    rows.find(_.getLong(0) == 1L).get.getDouble(1) shouldBe 1.0
    rows.find(_.getLong(0) == 2L).get.getDouble(1) shouldBe 0.0
  }

  test("runs inside whole-stage codegen over a real scan") {
    // a literal DataFrame constant-folds via ConvertToLocalRelation, so use
    // a parquet scan to observe the codegen'd projection
    val emb = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val df = emb.select(GraftFunctions.cosineSim(col("embedding"), col("embedding")).as("self"))
    // "*(1) Project" — the star marks a whole-stage-codegen stage
    df.queryExecution.executedPlan.toString should include("*(1) Project [cosine_sim")
    // self-similarity of any non-zero vector is exactly 1 in this formula
    df.collect().foreach(r => math.abs(r.getDouble(0) - 1.0) should be < 1e-12)
  }

  test("null inputs and zero norms yield null") {
    val df = Seq(
      (1L, Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 2.0f))), // zero norm
      (2L, None, Some(Array(1.0f, 2.0f)))                     // null input
    ).toDF("id", "a", "b")
    val out = df.select(GraftFunctions.cosineSim(col("a"), col("b"))).collect()
    out.foreach(_.isNullAt(0) shouldBe true)
  }

  test("SQL registration: cosine_sim is callable from SQL text") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("cosvecs")
    val r = spark.sql("SELECT cosine_sim(a, b) AS c FROM cosvecs WHERE id = 1").collect()
    r.head.getDouble(0) shouldBe 1.0
  }
}
