package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for joins whose key distribution has hot keys that a
 * single reducer cannot absorb (the classic 100 TB failure mode AQE's
 * skew-join split cannot always fix, e.g. when the hot key's rows must
 * still co-locate for a downstream aggregate).
 *
 * `saltedEquiJoin(facts, dim, key, n)` rewrites `facts ⋈ dim ON key`:
 *  - the large (skewed) side gets a deterministic pseudo-random salt in
 *    `[0, n)` per row;
 *  - the small side is replicated n× with every salt value;
 *  - the join runs on `(key, salt)`, spreading each hot key over n reducers.
 *
 * Result rows are exactly those of the unsalted join (verified by
 * `SkewSpec`). Choose n ≈ hot-key rows / target-partition rows.
 */
object Skew {

  private val SaltCol = "__graft_salt"

  def saltedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // right/full outer would surface each unmatched small-side row once per
    // salt replica — only join types that never emit unmatched small-side
    // rows are sound under replication
    require(
      Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "semi", "left_anti", "leftanti", "anti", "cross").contains(joinType.toLowerCase),
      s"saltedEquiJoin does not support join type '$joinType': replicating the " +
        "small side would duplicate its unmatched rows")
    // deterministic per-row salt: spread rows of one key uniformly without
    // rand() (keeps retried tasks and re-runs stable)
    val salted = large.withColumn(
      SaltCol,
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltBuckets.toLong)).cast("int"))
    val replicated = small.withColumn(
      SaltCol,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted
      .join(replicated, Seq(key, SaltCol), joinType)
      .drop(SaltCol)
  }
}
