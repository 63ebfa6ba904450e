package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.spark.TestSpark

/** Physical-plan audits: the properties that decide whether these operators
  * survive a 100× scale-up, pinned as tests so a regression (a filter that
  * stops pushing down, a broadcast that silently becomes a shuffle join, a
  * map-only op that grows a shuffle) fails CI rather than a cluster run.
  */
class PlanAuditSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.entries(name).fn(spark, sf).queryExecution.executedPlan.toString

  test("driver contract: the flagship entry returns rows; oracle keys name registered queries") {
    graft.SparkEntry.entry(spark).count() should be > 0L
    graft.SparkEntry.oracleSql.keySet.diff(graft.SparkEntry.queries.keySet) shouldBe empty
  }

  test("q01: shipdate filter and column projection reach the parquet scan") {
    val p = plan("q01_scan_filter")
    p should include("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate")
    p should include("ReadSchema")
    // pruned scan: none of the untouched columns appear in the read schema
    p should not include "l_comment"
    p should not include "l_tax"
  }

  test("q06: dimension joins broadcast instead of shuffling the fact table") {
    val p = plan("q06_join_multi")
    p should include("BroadcastHashJoin")
  }

  test("q09: aggregation is partial+final hash agg (map-side combine)") {
    val p = plan("q09_agg_tpch1")
    p should include("HashAggregate")
    p.split("HashAggregate").length should be >= 3 // partial + final at minimum
  }

  test("q14: ORDER BY + LIMIT plans as top-k, not a global sort") {
    plan("q14_topk") should include("TakeOrderedAndProject")
  }

  test("e2c: simhash is computed without any exchange (pure map)") {
    val body = plan("e2c_simhash").split("Sort").head
    // the only exchange allowed is the final presentation sort's range
    // partitioning; the fingerprint computation itself must be map-only
    body should not include "hashpartitioning"
  }

  test("e3: query set broadcasts; corpus is scanned once") {
    val p = plan("e3_cosine_topk")
    p should include("BroadcastNestedLoopJoin")
  }

  test("e1: dedup groups by the content hash, not raw text") {
    val p = plan("e1_exact_dedup")
    p should include("sha2")
  }

  test("AQE is active: shuffling plans re-optimize at runtime") {
    val p = plan("q09_agg_tpch1")
    p should include("AdaptiveSparkPlan")
  }

  private def analyzed(name: String): String =
    Registry.entries(name).fn(spark, sf).queryExecution.analyzed.toString

  test("e2/e5f: no per-document or vocabulary table is hint-broadcast") {
    // per-doc set sizes are row-local (size of the distinct-shingle array,
    // taken before the explode) and the df cap / token-frequency joins stay
    // shuffle-based — a forced broadcast of either side is a driver OOM at
    // corpus scale
    analyzed("e2_jaccard_neardup").toLowerCase should not include "broadcast"
    analyzed("e5f_doc_quality").toLowerCase should not include "broadcast"
  }

  test("e2: the inverted index is never sorted — df cap is agg + semi-join") {
    // the pair stage must carry no window: a count-over-window df cap (or a
    // per-doc size window) sorts the entire inverted index; the hash-agg +
    // left-semi shape filters it sort-free
    val p = plan("e2_jaccard_neardup")
    p should not include "Window"
  }

  test("e3/e3c/e3b/e3e: top-k merge is the typed partial aggregate, not a window") {
    // map-side partial top-k bounds the merge exchange to k rows per
    // (task × query); a per-qid window would funnel the scored corpus
    // through #queries reducers
    for (q <- Seq("e3_cosine_topk", "e3c_cosine_native", "e3b_lsh_ann")) {
      val p = plan(q)
      p should include("ObjectHashAggregate")
      p should not include "Window"
    }
    // e3e keeps windows for cell assignment (vec_id-partitioned — corpus
    // cardinality), but its final merge must still be the typed aggregate
    plan("e3e_ivf_ann") should include("ObjectHashAggregate")
  }

  test("e3b/e2d: SRP bucketing and scoring run as native codegen expressions, not HOFs") {
    // interpreted higher-order functions walk the vector once per plane and
    // drop out of whole-stage codegen; the native expressions keep the
    // corpus-wide bucketing scan in one codegen'd primitive loop
    val e3b = plan("e3b_lsh_ann")
    e3b should include("srp_bucket")
    e3b should include("dot_product")
    e3b should not include "lambdafunction"
    val e2d = plan("e2d_embedding_neardup")
    e2d should include("srp_bucket")
    e2d should include("cosine_sim")
    e2d should not include "lambdafunction"
  }

  test("q32: declared pivot values fold into one partial+final hash agg, no extra job") {
    // with explicit pivot values there is no distinct-values pre-job; the
    // cross-tab is a single groupBy(status) aggregation — one shuffle on
    // the group key, same profile as q09 at any scale
    val p = plan("q32_pivot")
    // two-level agg: (status, priority) partial+final, then pivotfirst on
    // status — both map-side-combined; no distinct-values scan job exists
    // because the pivot values are declared
    p should include("partial_pivotfirst")
    p.split("Exchange", -1).length shouldBe 4 // two agg shuffles + presentation sort only
  }

  test("e10: tf-idf top-k window partitions on doc_id and merges bounded") {
    val p = plan("e10_tfidf")
    // corpus-cardinality window key + WindowGroupLimit: each task forwards
    // at most k rows per doc to the merge, never the full scored term list
    p should include("windowspecdefinition(doc_id")
    p should include("WindowGroupLimit")
    // the doc-count side joins as a single-row broadcast, not a shuffle
    p should include("BroadcastNestedLoopJoin")
  }

  test("e11: the repetition ratio is map-only — one exchange, the presentation sort") {
    val p = plan("e11_repetition")
    p should include("shingle_hashes")
    p.split("Exchange", -1).length shouldBe 2 // rangepartitioning for ORDER BY only
  }

  test("e2b: minhash signatures are computed row-locally by the native expression") {
    val p = plan("e2b_minhash_lsh")
    p should include("minhash_signature")
    // no groupBy/window signature build — the only exchanges belong to the
    // band self-join and final ordering
    p should not include "Window"
  }

  test("q13b: the RANGE window is partitioned — no single-reducer funnel") {
    plan("q13b_window_range") should not include "SinglePartition"
  }

  test("q27: as-of join is union + keyed window — no join node at all") {
    val p = plan("q27_asof_join")
    p should include("Window")
    p should not include "Join" // the scalable as-of shape has no join
  }

  test("e8: incremental dedup is a hash anti-join on the content hash") {
    val p = plan("e8_incremental_dedup")
    p should include("LeftAnti")
    p should include("sha2")
    p should not include "CartesianProduct"
  }

  test("e9: stratified sampling is filter + partial/final agg — no join, no window") {
    val p = plan("e9_stratified_sample")
    p should include("HashAggregate")
    p should not include "Join"
    p should not include "Window"
  }

  test("q29: salted join keys carry the deterministic salt, no cross product") {
    val p = plan("q29_skew_join")
    // the salt is xxhash64-derived (not rand(): retried tasks must re-salt
    // identically) and the join stays a hash equi-join on (key, salt)
    p should include("xxhash64")
    p should not include "CartesianProduct"
  }

  test("q28: range join is a bucketed equi-join, not a nested-loop cross product") {
    val p = plan("q28_range_join")
    // a raw BETWEEN-only condition plans as BroadcastNestedLoopJoin; the
    // bucket key makes it hashable
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("e16: chunking is row-local — no exchange before the presentation sort") {
    val body = plan("e16_chunking").split("Sort").head
    body should not include "hashpartitioning"
  }

  test("e22/e23: corpus-derived count/pair tables join by shuffle, hash natively") {
    // the bigram/prefix count tables and the inverted index are
    // corpus-sized — a forced broadcast of either is a driver OOM at scale
    analyzed("e22_ngram_novelty").toLowerCase should not include "broadcast"
    val p = plan("e23_containment_dedup")
    p should include("shingle_hashes")
    p should not include "Window"
    analyzed("e23_containment_dedup").toLowerCase should not include "broadcast"
  }

  test("e20: sequence packing windows on the shard key — no single-reducer funnel") {
    val p = plan("e20_sequence_packing")
    p should include("windowspecdefinition(shard")
    p should not include "SinglePartition"
  }

  test("e19: span dedup hashes natively and joins the dup-span table by shuffle") {
    val p = plan("e19_span_dedup")
    p should include("span_hashes") // the whole span pass is one native expression
    p should not include "lambdafunction" // no interpreted HOF stack remains
    // the duplicated-span table is corpus-derived — never broadcast
    p should include("ShuffledHashJoin")
    p should not include "BroadcastHashJoin"
  }

  test("e18: quantized ANN scores with the native dot product, merges via typed top-k") {
    val p = plan("e18_quantized_ann")
    p should include("dot_product")
    p should include("BroadcastNestedLoopJoin") // the 5-query set broadcasts
    p should include("ObjectHashAggregate")     // bounded top-k merge
    p should not include "Window"
  }

  test("e17: k-means broadcasts centroids, windows on vec_id, means via typed agg") {
    val p = plan("e17_kmeans")
    // the k×64 centroid table rides a broadcast into every assignment pass
    p should include("BroadcastNestedLoopJoin")
    // argmax assignment partitions on the corpus-cardinality vec_id key
    p should include("windowspecdefinition(vec_id")
    // mean update is the typed partial-agg aggregator: the shuffle carries
    // 64-slot buffers per (cell × task), never raw vectors
    p should include("ObjectHashAggregate")
    p should include("cosine_sim")
  }

  test("e28: quality dedup removes via SHUFFLED anti-join; no corpus broadcast") {
    val p = plan("e28_quality_dedup")
    // the dropped set is duplicate-count-sized but corpus-derived — the
    // shuffle_hash hint must hold so web-scale dedup never broadcasts it;
    // canonical selection is a window keyed on the cluster id
    p should include("ShuffledHashJoin")
    p should include("LeftAnti")
    p should not include "CartesianProduct"
  }

  test("e29: the persisted-IVF query scans the postings table with a cell partition filter") {
    val p = plan("e29_persisted_ivf")
    // the probe list must land as a PARTITION filter on the postings read:
    // only nProbe/k of the index's files are handed to any task (the
    // centroid scan in the same plan legitimately has no partition filter)
    assert(p.split("PartitionFilters: ").exists(_.startsWith("[cell")),
      s"no cell partition filter on the postings scan:\n$p")
  }

  test("e30: the incrementally-maintained IVF index still probes via a cell partition filter") {
    val p = plan("e30_ivf_ingest")
    // the e29 read-path contract must survive incremental maintenance: the
    // MERGE-ingested postings table is still partition-pruned by probe list.
    // (The write-side contract — only the batch's cells rewrite, the other
    // inverted lists keep their version pointers — is asserted against the
    // commit log inside the query itself, which is stronger than a plan pin.)
    assert(p.split("PartitionFilters: ").exists(_.startsWith("[cell")),
      s"no cell partition filter on the postings scan:\n$p")
  }

  test("e8b: the corpus band-key table joins by SHUFFLE, never broadcast") {
    val p = plan("e8b_incremental_neardup")
    // at web scale the stored band table is not broadcastable; the
    // shuffle_hash hint must keep holding against the size heuristic. (The
    // final anti-join against the FLAGGED id set may broadcast — that set
    // is bounded by the arrival batch, not the corpus.)
    p should include("ShuffledHashJoin")
    p should include("LeftSemi")
    p should not include "CartesianProduct"
  }

  test("e32: shard export is one hash exchange + per-shard window — no global sort, no single reducer") {
    val p = plan("e32_shard_export")
    p should include("windowspecdefinition(shard")
    p should not include "SinglePartition"
    // exactly one exchange feeds the window (the shard hash partitioning);
    // the only other exchange is the presentation sort's range partitioner
    p.split("Exchange hashpartitioning").length shouldBe 2
  }

  test("e33: concat-and-chunk packing windows on the shard key and stays shard-parallel") {
    val p = plan("e33_sequence_packing")
    p should include("windowspecdefinition(shard")
    p should not include "SinglePartition"
    p should not include "CartesianProduct"
  }

  test("q72/q73: the rebase and clone queries aggregate with partial+final hash agg") {
    plan("q72_occ_rebase") should include("HashAggregate")
    plan("q73_shallow_clone") should include("HashAggregate")
  }

  test("e31: SemDeDup pairs come from a cell-keyed equi-join — no cartesian, no corpus broadcast") {
    val p = plan("e31_semdedup")
    // the in-cell pair sweep must be an equi-join ON THE CELL KEY (Σ cell²
    // work, parallel across cells), never an all-pairs product over the
    // corpus. (The plan's BroadcastNestedLoopJoins are the quantizer's
    // broadcast(centroids) cross joins — k rows, metadata-sized, the
    // e3e/e17 pattern.)
    p should not include "CartesianProduct"
    p should include("ShuffledHashJoin")
    p.split("\n").find(_.contains("ShuffledHashJoin")).get should include("cell")
  }

  test("e34: BM25 HINT-broadcasts only the query-term set and the 1-row stats") {
    // the vocabulary-keyed df/dlen tables must never be FORCED broadcast —
    // a web-scale vocabulary isn't broadcastable (the optimizer may still
    // choose to broadcast them on toy data; that is its call, not a hint)
    val a = analyzed("e34_bm25")
    a.split("\n").count(_.contains("UnresolvedHint")) shouldBe 0
    a.split("\n").count(_.toLowerCase.contains("broadcast")) should be <= 2
    plan("e34_bm25") should not include "CartesianProduct"
  }

  test("e35: the LM scorer filters the SAMPLED docs below the model joins") {
    val p = plan("e35_bigram_lm")
    // the sample predicate must reach the scan side feeding the count
    // joins — scoring joins carry only the sampled docs' bigrams
    p should include("(doc_id#")
    p.split("\n").exists(l => l.contains("Filter") && l.contains("% 25")) shouldBe true
    p should not include "CartesianProduct"
  }

  test("e36: hybrid fusion joins two bounded top-k sides — no corpus-sized join") {
    val p = plan("e36_hybrid_rrf")
    // the dense leg merges through the typed top-k aggregate (objecthashagg
    // over the TopKAggregator), never a corpus-wide window
    p should include("ObjectHashAggregate")
    p should not include "CartesianProduct"
  }
}
