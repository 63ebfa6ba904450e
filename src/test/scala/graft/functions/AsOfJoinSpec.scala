package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.spark.TestSpark

class AsOfJoinSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  test("picks the latest right row at or before each left time, per key") {
    val trades = Seq(
      ("t1", 1L, 10L), // before any quote → null
      ("t2", 1L, 20L), // exactly at quote time 20 → inclusive match
      ("t3", 1L, 35L), // between quotes 30 and 40 → 30's value
      ("t4", 2L, 50L)  // other key entirely
    ).toDF("trade_id", "k", "t")
    val quotes = Seq(
      (1L, 20L, 2.0),
      (1L, 30L, 3.0),
      (1L, 40L, 4.0),
      (2L, 49L, 9.0)
    ).toDF("k", "t", "px")

    val out = AsOfJoin
      .asOf(trades, quotes, key = "k", leftTime = "t", rightTime = "t",
        valueCol = "px", asCol = "asof_px")
      .collect()
      .map(r => r.getString(0) -> Option(r.get(3)))
      .toMap

    out("t1") shouldBe None
    out("t2") shouldBe Some(2.0)
    out("t3") shouldBe Some(3.0)
    out("t4") shouldBe Some(9.0)
  }

  test("left columns are preserved and row count is exactly the left side's") {
    val left = Seq((1L, 5L, "x"), (1L, 6L, "y")).toDF("k", "t", "payload")
    val right = Seq((1L, 5L, 1.5)).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "t", "v", "asof_v")
    out.columns shouldBe Array("k", "t", "payload", "asof_v")
    out.count() shouldBe 2
  }
}
