package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.spark.TestSpark

class ShingleHashesSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session

  test("matches the SQL xxhash64(concat_ws(...)) formulation exactly") {
    val docs = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaSql = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .where(expr("size(tk) >= 3"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(tk) - 3), i -> xxhash64(concat_ws(' ', slice(tk, i + 1, 3)))))"
      )).as("shh"))
    val viaNative = docs
      .select(col("doc_id"),
        explode(GraftFunctions.shingleHashes(split(col("text"), " "))).as("shh"))
    viaSql.exceptAll(viaNative).count() shouldBe 0
    viaNative.exceptAll(viaSql).count() shouldBe 0
    viaNative.count() should be > 0L
  }

  test("short and null-bearing token arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b")),            // < 3 tokens → empty
      (2L, Seq("a", "b", "c", "b", "c")) // 3 shingles, all distinct
    ).toDF("id", "tk")
    val rows = df.select(col("id"), GraftFunctions.shingleHashes(col("tk")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows(1L) shouldBe Seq.empty
    rows(2L).length shouldBe 3
    rows(2L).distinct.length shouldBe 3
  }
}
