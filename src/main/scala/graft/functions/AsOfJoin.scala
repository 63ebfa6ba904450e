package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time ("as-of") join — the temporal join a training-data pipeline
 * uses to attach the most recent feature/label observation at or before each
 * event's timestamp (market-data "last quote at trade time" is the classic).
 *
 * Spark has no native as-of join; the scalable formulation is NOT a range
 * join (whose candidate set is a per-key cross product) but union + keyed
 * window: tag both sides, sort each key's timeline once, and carry the last
 * non-null right value forward. Cost: ONE shuffle on the key — identical to
 * any keyed aggregation, so it scales like groupBy, not like a theta join.
 *
 * Semantics: for each left row, the right row with the greatest
 * `rightTime <= leftTime` and the same key (inclusive, like SQL ASOF JOIN);
 * left rows with no preceding right row get null. The right side must be
 * unique per (key, time) — pre-aggregate if it isn't, or the carried value
 * is undefined.
 */
object AsOfJoin {

  /** @param valueCol right-side column to carry; appears on the output as
    *                 `asCol`. All left columns are preserved. */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      valueCol: String,
      asCol: String): DataFrame = {
    val leftCols = left.columns
    val reserved = Set("__t", "__src", "__m")
    require(!(leftCols ++ right.columns).exists(reserved),
      s"asOf reserves working columns ${reserved.mkString(", ")}")
    require(!leftCols.contains(asCol),
      s"asOf output column '$asCol' collides with a left column")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__src", lit(1))
    // the observation rides inside a never-null struct marker: `last` with
    // ignoreNulls must skip LEFT rows (which carry no observation) but keep
    // a right row whose value is genuinely NULL — bare `last(value)` would
    // carry an older non-null value forward instead, diverging from SQL
    // ASOF JOIN semantics on nullable observation columns
    // SQL ASOF equality never matches NULL = NULL: a null-key right row
    // must not become the carried observation of null-key left rows (which
    // the null-grouping window partition would otherwise do)
    val r = right.where(col(key).isNotNull).select(
      col(key),
      col(rightTime).as("__t"),
      lit(0).as("__src"),
      struct(lit(true).as("present"), col(valueCol).as("value")).as("__m"))
    // right rows sort before left rows at equal time (__src 0 < 1), making
    // the join boundary inclusive; among left rows the carried value is
    // order-independent (their __m is null)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(asCol, last("__m", ignoreNulls = true).over(w).getField("value"))
      .where(col("__src") === 1)
      .select(leftCols.map(col) :+ col(asCol): _*)
  }
}
