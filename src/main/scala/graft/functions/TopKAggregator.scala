package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed bounded top-k aggregate (SURVEY.md §2.3 UDF/UDAF surface): keeps the
 * k best `(id, score)` pairs ordered by (score DESC, id ASC) — the exact
 * ordering of `row_number() OVER (ORDER BY score DESC, id)`.
 *
 * This is the scale-safe merge step for similarity search: used as
 * `groupByKey(qid).agg(...)`, partial aggregation trims to k on the map
 * side, so the shuffle carries at most k rows per (map task × query) instead
 * of funnelling every scored corpus row through one reducer per query.
 *
 * Input is `(qid, id, score)`; the qid is the grouping key and is ignored
 * here. Buffers are primitive parallel arrays (≤ k entries, sorted), so
 * insertion is O(k) with zero boxing.
 */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long, Double), (Array[Long], Array[Double]), Seq[(Long, Double)]] {
  require(k > 0, s"top-k size must be positive, got $k")

  /** `row_number` ordering: higher score first, lower id on ties.
    * `Double.compare`, not `>`: SQL DESC ordering ranks NaN as the largest
    * double, while primitive comparisons make NaN lose to everything — a
    * NaN score would silently vanish from the top-k. */
  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  override def zero: (Array[Long], Array[Double]) =
    (Array.empty[Long], Array.empty[Double])

  private def insert(
      b: (Array[Long], Array[Double]), id: Long, score: Double): (Array[Long], Array[Double]) = {
    val (ids, ss) = b
    val n = ids.length
    if (n >= k && !beats(score, id, ss(n - 1), ids(n - 1))) b
    else {
      var p = 0
      while (p < n && beats(ss(p), ids(p), score, id)) p += 1
      val m = math.min(n + 1, k)
      val nids = new Array[Long](m)
      val nss = new Array[Double](m)
      Array.copy(ids, 0, nids, 0, p)
      Array.copy(ss, 0, nss, 0, p)
      nids(p) = id
      nss(p) = score
      val tail = m - p - 1
      if (tail > 0) {
        Array.copy(ids, p, nids, p + 1, tail)
        Array.copy(ss, p, nss, p + 1, tail)
      }
      (nids, nss)
    }
  }

  override def reduce(
      b: (Array[Long], Array[Double]), in: (Long, Long, Double)): (Array[Long], Array[Double]) =
    insert(b, in._2, in._3)

  override def merge(
      a: (Array[Long], Array[Double]), b: (Array[Long], Array[Double])): (Array[Long], Array[Double]) = {
    var r = a
    var i = 0
    while (i < b._1.length) { r = insert(r, b._1(i), b._2(i)); i += 1 }
    r
  }

  override def finish(b: (Array[Long], Array[Double])): Seq[(Long, Double)] =
    b._1.toSeq.zip(b._2.toSeq)

  override def bufferEncoder: Encoder[(Array[Long], Array[Double])] =
    ExpressionEncoder[(Array[Long], Array[Double])]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
