package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bucketed interval ("range") join — points matched to the intervals that
 * contain them. Spark plans a raw `t BETWEEN lo AND hi` predicate as a
 * broadcast nested-loop (per-key cross product): fatal at corpus scale.
 *
 * The scalable formulation maps both sides onto fixed-width time buckets:
 * an interval lands in every bucket it overlaps (`explode(sequence(...))`,
 * ≤ ⌈span/width⌉ + 1 rows), a point lands in exactly ONE bucket — so the
 * bucket equi-join meets each (point, interval) pair at most once and no
 * dedup step is needed. Cost: one shuffle on (key, bucket), like any
 * aggregation; the residual `BETWEEN` filter runs post-join on candidates
 * only. Pick `bucketWidth` near the typical interval span so the explode
 * factor stays ~2.
 *
 * Boundary semantics are inclusive on both ends (SQL BETWEEN).
 */
object RangeJoin {

  /** @param key       equality column present on both sides
    * @param pointCol  long point column on `points`
    * @param loCol     long interval start (inclusive) on `intervals`
    * @param hiCol     long interval end (inclusive) on `intervals`
    * @param bucketWidth bucket width in the point/interval unit */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // backticked: raw interpolation breaks on column names needing quoting
    val iv = intervals.withColumn(
      "__bucket",
      explode(expr(s"sequence(`$loCol` div $bucketWidth, `$hiCol` div $bucketWidth)")))
    val pt = points.withColumn("__bucket", expr(s"`$pointCol` div $bucketWidth"))
    pt.join(iv, Seq(key, "__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
