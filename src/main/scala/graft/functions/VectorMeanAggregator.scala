package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed aggregate (SURVEY.md §2.3 UDF/UDAF surface — `Aggregator[IN,BUF,OUT]`):
 * element-wise mean of embedding vectors, e.g. per-label centroids for IVF
 * coarse quantizers or class prototypes.
 *
 * The buffer is a primitive running-sum array + count, so partial
 * aggregation (map-side combine) works exactly like a built-in agg: the
 * shuffle carries one `dim`-length buffer per group per map task, never raw
 * vectors.
 */
final class VectorMeanAggregator(dim: Int)
    extends Aggregator[(Int, Array[Float]), (Array[Double], Long), Array[Double]] {
  require(dim > 0, s"vector dimension must be positive, got $dim")

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), in: (Int, Array[Float])): (Array[Double], Long) = {
    val (sums, n) = b
    val v = in._2
    // a silently zero-padded/truncated vector would drag the whole group's
    // centroid toward zero with no error — surface the bad row instead
    require(v != null && v.length == dim,
      s"expected a $dim-dimensional vector, got ${if (v == null) "null" else v.length.toString}")
    var i = 0
    while (i < dim) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { x._1(i) += y._1(i); i += 1 }
    (x._1, x._2 + y._2)
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) new Array[Double](dim) else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
