package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Unit contract of the bounded top-k buffer: row_number ordering
  * (score DESC, id ASC), k-trim, and merge-order independence — the
  * property partial aggregation relies on. */
class TopKAggregatorSpec extends AnyFunSuite with Matchers {

  private val agg = new TopKAggregator(3)

  private def reduceAll(xs: Seq[(Long, Long, Double)]) =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("keeps the k best by score desc, id asc on ties") {
    val buf = reduceAll(Seq(
      (0L, 10L, 0.5), (0L, 11L, 0.9), (0L, 12L, 0.7),
      (0L, 13L, 0.9), (0L, 14L, 0.1)))
    agg.finish(buf) shouldBe Seq((11L, 0.9), (13L, 0.9), (12L, 0.7))
  }

  test("buffer never exceeds k") {
    val buf = reduceAll((1L to 100L).map(i => (0L, i, i.toDouble)))
    buf._1.length shouldBe 3
    agg.finish(buf) shouldBe Seq((100L, 100.0), (99L, 99.0), (98L, 98.0))
  }

  test("merge is order-independent (partial aggregation contract)") {
    val xs = Seq[(Long, Long, Double)](
      (0L, 1L, 0.3), (0L, 2L, 0.8), (0L, 3L, 0.8), (0L, 4L, 0.2), (0L, 5L, 0.99))
    val (l, r) = xs.splitAt(2)
    val a = agg.merge(reduceAll(l), reduceAll(r))
    val b = agg.merge(reduceAll(r), reduceAll(l))
    agg.finish(a) shouldBe agg.finish(b)
    agg.finish(a) shouldBe Seq((5L, 0.99), (2L, 0.8), (3L, 0.8))
  }

  test("empty and singleton buffers") {
    agg.finish(agg.zero) shouldBe Seq.empty
    agg.finish(agg.reduce(agg.zero, (0L, 7L, 0.5))) shouldBe Seq((7L, 0.5))
  }
}
