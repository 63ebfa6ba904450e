package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.spark.TestSpark

/** Float-summation-order determinism pins for every oracle surface that
  * rounds a floating-point AGGREGATE: a `round(avg(double), k)` whose true
  * mean sits near a 0.5×10⁻ᵏ boundary can coin-flip with task completion
  * order (the round-8 `e26_minhash_calibration` flake). Each risky query is
  * built and collected twice under different `spark.sql.shuffle.partitions`
  * — different partial-aggregate merge trees, hence different float
  * summation orders — and the sorted row sets must match exactly.
  *
  * This is the cheap in-CI twin of the full-surface gate
  * (`SPARK_GRAFT_DETERMINISM=1 runMain graft.Verify <sf> <out>` double-runs
  * all registered queries); the set pinned here is every entry whose final
  * projection rounds an avg/stddev/var/covar/corr over doubles.
  */
class DeterminismSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose outputs round an FP aggregate (grep: round(avg|stddev|
    * var_samp|covar_samp|corr) over double columns) plus e26's fixed-point
    * calibration — the surfaces where a boundary-sitting mean would flake. */
  private val risky = Seq(
    "q09_agg_tpch1",          // avg_qty 4dp, avg_disc 6dp
    "q23_conditional",        // avg_k 6dp
    "q33_percentiles",        // interpolated percentiles
    "q34_stats",              // stddev/var/covar/corr
    "e3d_label_centroids",    // 5dp centroid means
    "e5b_lang_stats",         // avg_chars 4dp
    "e10_tfidf",              // mean_log_tf 6dp
    "e15_corpus_prep",        // avg_tokens 4dp
    "e17_kmeans",             // 6dp Lloyd centroids
    "e21_temperature_mix",    // sampling-weight shares
    "e22_ngram_novelty",      // avg_surprise 4dp
    "e26_minhash_calibration" // integer-domain calibration (regression pin)
  )

  private def runOnce(name: String, partitions: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    Pipeline.clearStageCache()
    try Registry.entries(name).fn(spark, sf).collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (name <- risky)
    test(s"$name: output identical under different shuffle partitioning") {
      val a = runOnce(name, 13)
      val b = runOnce(name, 3)
      a.size shouldBe b.size
      a.lazyZip(b).foreach { (x, y) => x shouldBe y }
    }
}
