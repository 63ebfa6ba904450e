package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.spark.TestSpark

class RangeAndClusterSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  test("range join: inclusive bounds, multi-bucket intervals, no duplicate pairs") {
    val points = Seq(
      ("p1", 1L, 100L),  // inside [90, 110]
      ("p2", 1L, 90L),   // exactly at lo — inclusive
      ("p3", 1L, 110L),  // exactly at hi — inclusive
      ("p4", 1L, 111L),  // just past hi
      ("p5", 2L, 100L)   // right key range, wrong key
    ).toDF("pid", "k", "t")
    // width 10 → interval spans buckets 9..11: the multi-bucket explode path
    val intervals = Seq((1L, 90L, 110L)).toDF("k", "lo", "hi")
    val out = RangeJoin
      .pointInInterval(points, intervals, "k", "t", "lo", "hi", bucketWidth = 10L)
      .select("pid").as[String].collect().sorted
    out shouldBe Array("p1", "p2", "p3")
    // each matching pair appears exactly once despite the interval's 3 buckets
    out.length shouldBe out.distinct.length
  }

  test("connected components: transitive chains collapse to the least id") {
    // two components: {1,2,3,4} as a chain (diameter 3 — needs iteration)
    // and {10, 11}
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("a", "b")
    val labels = DupClusters.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    labels shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L)
  }
}
