package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators (SURVEY.md §2.4, E1–E5) over the `documents`
  * and `embeddings` tables: dedup (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash), similarity search, multimodal-column plumbing, text analysis,
  * fingerprinting.
  *
  * 100 TB design notes:
  *  - nothing here is O(n²): near-dup candidates come from an inverted
  *    shingle index / LSH band buckets (equi-join + groupBy, i.e. shuffle on
  *    a key), never from an all-pairs cross join;
  *  - document-frequency capping bounds the worst shingle bucket, the same
  *    way stopword-shingle dropping works in production dedup pipelines;
  *  - no per-document table is ever broadcast: per-doc set sizes ride along
  *    the inverted-index rows (window count), so every join key is the
  *    bounded shingle/bucket key and the driver never holds corpus-sized
  *    state;
  *  - similarity search broadcasts the (small) query set, scores in one
  *    corpus pass, and merges through [[graft.functions.TopKAggregator]] —
  *    map-side partial top-k, so the merge shuffle carries ≤ k rows per
  *    (map task × query), never the scored corpus.
  */
object Pipeline {
  import Tables.load

  // ---------------------------------------------------------------- E1

  /** E1: exact dedup by content hash. The 256-bit hash stands in for the
    * full text as the shuffle key — at 100 TB you never shuffle raw text. */
  def e1ExactDedup(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .withColumn("h", sha2(col("text"), 256))
      .groupBy("h")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  // ---------------------------------------------------------------- E2

  /** E2: exact n-gram Jaccard near-dup pairs via an inverted shingle index.
    * Self-join on the shingle key (shuffle-based equi-join, never all-pairs)
    * → per-pair intersection counts → Jaccard = |∩| / (|A|+|B|-|∩|).
    *
    * Shingles occurring in more than [[MaxShingleDf]] documents are dropped
    * (stopword-shingles): they carry no near-dup signal and their buckets
    * grow O(df²) pair rows — the cap is what keeps the self-join linear in
    * corpus size. The oracle applies the identical cap.
    *
    * Denominator convention: |A| and |B| are the FULL per-doc shingle-set
    * sizes (taken row-locally before the df filter), so the cap only prunes
    * candidate generation — it never inflates a surviving pair's score the
    * way post-filter sizes would. The oracle mirrors this exactly.
    *
    * Per-doc set sizes ride the index rows as a row-local column, NOT a
    * broadcast per-document table — at corpus scale a per-doc broadcast is
    * a driver OOM; sizes just ride the pair aggregation as grouping cols. */
  val MaxShingleDf = 128

  /** DF-capped inverted-index PAIR COUNTS `(doc_a, doc_b, na, nb, c)` —
    * the shared candidate-generation stage, memoized per (session, dir):
    * thresholded Jaccard (e2, e7) and directional containment (e23) are
    * row-local derivations over it — intra-session reuse of a stage
    * output, exactly what a production pipeline persists between steps.
    * The memo is scoped to one verify/bench run over immutable input dirs;
    * a process that mutates `dir` mid-session must call
    * [[clearStageCache]]. */
  private val pairCountsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Duplicate-cluster labels `(id, cluster)` — the second shared stage:
    * e7 (cluster listing), e27 (lowest-id removal), and e28 (quality-aware
    * removal) all consume the SAME label-propagation output over the same
    * pair graph; recomputing the iterative propagation per query would
    * triple the most expensive dedup stage. Same memo scope and lifecycle
    * as [[pairCountsCache]]. */
  private val componentsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def dupComponents(s: SparkSession, dir: String): DataFrame =
    componentsCache.getOrElseUpdate((s, dir),
      graft.functions.DupClusters
        .connectedComponents(
          jaccardPairs(s, dir).select("doc_a", "doc_b"), "doc_a", "doc_b")
        .persist())

  /** Drops ONLY the pair-counts memo (Bench's e2 repeat protocol: the pair
    * stage must genuinely re-execute, but the components stage e7/e27/e28
    * share stays warm — clearing it too would make a later e7 rebuild a
    * stage it deliberately consumes). */
  def clearPairStageCache(): Unit = {
    pairCountsCache.values.foreach(_.unpersist())
    pairCountsCache.clear()
  }

  /** Drops every memoized stage and releases its cache blocks (the
    * determinism gate and any dir-mutating caller need a cold start). */
  def clearStageCache(): Unit = {
    clearPairStageCache()
    componentsCache.values.foreach(_.unpersist())
    componentsCache.clear()
  }

  private def shinglePairCounts(s: SparkSession, dir: String): DataFrame =
    pairCountsCache.getOrElseUpdate((s, dir), {
      // per-doc set size is ROW-LOCAL: ShingleHashes already emits the
      // distinct shingle hashes, so |shingles(doc)| = size(shs) taken before
      // the explode — no per-doc window, no per-doc join, and nothing
      // document-sized ever crosses an exchange or reaches the driver.
      // The index shuffles an 8-byte hash per shingle, never shingle text —
      // at 100 TB the inverted index is all shuffle traffic and the 64-bit
      // key keeps it minimal (collision odds negligible next to the DF cap).
      val base = load(s, dir, "documents")
        .select(
          col("doc_id"),
          graft.plans.GraftFunctions.shingleHashes(split(col("text"), " ")).as("shs"))
        .select(
          col("doc_id"),
          size(col("shs")).cast("long").as("n"),
          explode(col("shs")).as("shh"))
      // document-frequency cap as partial+final hash-agg + semi-join on the
      // shingle key: the agg shuffle carries #distinct shingles and the
      // semi-join filters the index with zero sorting (a count-over-window
      // here would sort the whole inverted index). shuffle_hash, not
      // broadcast: the per-shingle df table is vocabulary-sized — at corpus
      // scale it must stay off the driver.
      val kept = base.groupBy("shh").agg(count(lit(1)).as("df"))
        .where(col("df") <= MaxShingleDf)
        .select("shh")
      val sh = base.join(kept.hint("shuffle_hash"), Seq("shh"), "left_semi").cache()
      // aliased self-join: both sides are the SAME cached plan, already
      // hash-partitioned on shh by the semi-join, so the pair join reads the
      // cache without a fresh exchange on either side
      val pairs = sh.as("x").join(sh.as("y"),
          col("x.shh") === col("y.shh") && col("x.doc_id") < col("y.doc_id"))
        .select(
          col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.n").as("na"), col("y.n").as("nb"))
        // na/nb are functionally dependent on doc_a/doc_b — grouping by them
        // adds no shuffle width and saves the post-agg size joins entirely
        .groupBy("doc_a", "doc_b", "na", "nb").agg(count(lit(1)).as("c"))
        .cache()
      // materialize the stage output now so the (large) index cache can be
      // freed immediately: pairs holds co-occurring pairs only (bounded by
      // the DF cap), sh is O(tokens)
      pairs.count()
      sh.unpersist()
      pairs
    })

  /** Thresholded Jaccard pairs — a row-local derivation over the shared
    * pair-counts stage. */
  private def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    shinglePairCounts(s, dir)
      .withColumn("jaccard", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .where(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")

  def e2JaccardNearDup(s: SparkSession, dir: String): DataFrame =
    jaccardPairs(s, dir)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** E2: MinHash + LSH banded candidate pairs. 16 hash permutations in 4
    * bands of 4; candidates = docs sharing a band key.
    *
    * The whole signature is computed ROW-LOCALLY by the native codegen'd
    * [[graft.plans.MinHashSignature]] expression (one primitive-loop pass
    * per document) — no explode, no groupBy, zero exchange until the
    * band-bucket equi-join. The hash family is portable modular arithmetic
    * and the band key a polynomial combine, so the ENTIRE pipeline —
    * signatures, banding, candidate pairs — is reproduced exactly by the
    * SQL oracle (hash-checked, not rows-only).
    * Scale: the only shuffle is the (band, key) self-join — bucket sizes are
    * bounded by LSH collision probability, not corpus size. */
  def e2bMinHashLsh(s: SparkSession, dir: String): DataFrame = {
    val bands = minhashBands(load(s, dir, "documents"))
    // aliased self-join: identical plan on both sides → one exchange, reused
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Shared LSH machinery: `(doc_id, band, key)` minhash band keys — 16
    * permutations in 4 bands of 4, the row-local native
    * [[graft.plans.MinHashSignature]] pass plus a portable polynomial band
    * combine (values < M keep every product < 2^63). With `carrySig` the
    * full signature rides each band row, so a consumer comparing
    * signatures per candidate pair (e26) needs no join back — the corpus
    * signature pass runs exactly once. */
  private def minhashBands(docs: DataFrame, carrySig: Boolean = false): DataFrame = {
    val nHashes = 16
    val bandSize = 4
    val M = graft.plans.MinHashSignature.Mod
    val sigs = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= 3)
      .select(
        col("doc_id"),
        graft.plans.GraftFunctions.minhashSignature(col("tk"), nHashes).as("sigs"))
    val bandCols = (0 until nHashes / bandSize).map { band =>
      val key = (0 until bandSize)
        .map(j => s"element_at(sigs, ${band * bandSize + j + 1})")
        .reduce((acc, h) => s"($acc * 31 + $h) % $M")
      struct(lit(band).as("band"), expr(key).as("key")).as(s"b$band")
    }
    val carryIn = if (carrySig) Seq(col("sigs").as("sig")) else Nil
    val carryOut = if (carrySig) Seq(col("sig")) else Nil
    sigs
      .select(col("doc_id") +: carryIn :+ explode(array(bandCols: _*)).as("bk"): _*)
      .select(col("doc_id") +: carryOut :+ col("bk.band").as("band") :+ col("bk.key").as("key"): _*)
  }

  /** E8b: incremental NEAR-dup dedup — the LSH twin of [[e8IncrementalDedup]]:
    * today's arrivals (odd doc_ids) are screened against the existing
    * corpus (even doc_ids) by minhash band-key collision, and only arrivals
    * colliding with NO corpus band key survive. The corpus side is the
    * stored band-key table a production ingest maintains incrementally, so
    * each batch costs O(batch band keys) in shuffle — never a corpus text
    * rescan, and nothing document-sized moves. shuffle_hash on the corpus
    * side: a web-scale band table is not broadcastable. The portable hash
    * family keeps the whole path oracle-checked. */
  def e8bIncrementalNearDup(s: SparkSession, dir: String): DataFrame = {
    val bands = minhashBands(load(s, dir, "documents"))
    val corpus = bands.where(col("doc_id") % 2 === 0).select("band", "key")
    val arrivals = bands.where(col("doc_id") % 2 === 1)
    val flagged = arrivals
      .join(corpus.hint("shuffle_hash"), Seq("band", "key"), "left_semi")
      .select("doc_id").distinct()
    arrivals.select("doc_id").distinct()
      .join(flagged, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** E2: 16-bit SimHash fingerprint per document (token-hash bit votes).
    * Token hashes come from the native portable [[graft.plans.TokenHashes]]
    * expression (one primitive pass), then the bit votes are row-local
    * long ops — zero shuffle, a pure map over the corpus. A bit is set when
    * more than half the token hashes have that bit set (majority vote; the
    * ±1-vote formulation `sum > 0` ⟺ `2·countSet > total`). The portable
    * hash makes the fingerprint oracle-checked. */
  def e2cSimHash(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(
        col("doc_id"),
        graft.plans.GraftFunctions.tokenHashes(split(col("text"), " ")).as("th"))
      .select(
        col("doc_id"),
        expr(
          """aggregate(
            |  transform(sequence(0, 15), j ->
            |    CASE WHEN size(filter(th, h -> ((h >> j) & 1) = 1)) * 2 > size(th)
            |         THEN shiftleft(1L, j) ELSE 0L END),
            |  0L, (a, x) -> a + x)""".stripMargin).as("simhash16"))
      .orderBy("doc_id")

  // ------------------------------------------------- E3 shared machinery

  /** Scale-safe per-query top-k merge: typed [[graft.functions.TopKAggregator]]
    * under `groupByKey(qid)` — map-side partial aggregation trims each task's
    * contribution to k rows, so the merge exchange carries ≤ k × #tasks rows
    * per query instead of the entire scored corpus. Output: one row per
    * (qid, rank) with columns (qid, rk, vec_id, cos). */
  private[queries] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    scored
      .select(col("qid").cast("long"), col("vec_id").cast("long"), col("cos").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new graft.functions.TopKAggregator(k).toColumn.name("topk"))
      .toDF("qid", "topk")
      .select(col("qid"), posexplode(col("topk")))
      .select(
        col("qid"),
        (col("pos") + 1).cast("long").as("rk"),
        col("col._1").as("vec_id"),
        col("col._2").as("cos"))
  }

  // Signed-random-projection bucketing runs through the native codegen'd
  // [[graft.plans.SrpBucket]] expression (one primitive loop for all plane
  // dots, fed the raw float arrays). Its portable parity-weight formula is
  // mirrored by the SQL oracles (`Registry.planeDotSql`) and pinned
  // native-vs-HOF bit-identical in `VectorOpsSpec`.

  // ---------------------------------------------------------------- E3

  /** E3: brute-force top-k cosine similarity. The query set (5 vectors) is
    * broadcast; one scan over the corpus computes all query×corpus scores,
    * then the typed top-k aggregate merges (see [[topKPerQuery]]) — the same
    * shape holds verbatim on a 1000-executor cluster. */
  def e3CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = load(s, dir, "embeddings")
      .withColumn("dvec", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("norm2", expr("aggregate(dvec, cast(0 as double), (a, x) -> a + x * x)"))
      .select("vec_id", "dvec", "norm2")
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("dvec").as("qvec"), col("norm2").as("qn"))
    val scored = emb.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos",
        expr("aggregate(zip_with(dvec, qvec, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)") /
          (sqrt(col("norm2")) * sqrt(col("qn"))))
    topKPerQuery(scored, 10)
      .select(col("qid"), col("rk"), col("vec_id"), round(col("cos"), 5).as("cos_sim"))
      .orderBy("qid", "rk")
  }

  /** E3 (native expression): same top-k as [[e3CosineTopK]] but scored by
    * the codegen'd Catalyst expression [[graft.plans.CosineSimilarity]] —
    * a primitive-array loop inside whole-stage codegen instead of the
    * HOF zip_with/aggregate allocation per row. Same oracle. */
  def e3cCosineNative(s: SparkSession, dir: String): DataFrame = {
    val emb = load(s, dir, "embeddings").select("vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = emb.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos", graft.plans.GraftFunctions.cosineSim(col("embedding"), col("qvec")))
    topKPerQuery(scored, 10)
      .select(col("qid"), col("rk"), col("vec_id"), round(col("cos"), 5).as("cos_sim"))
      .orderBy("qid", "rk")
  }

  /** E3 (scale path): LSH-bucketed approximate NN. Signed random projections
    * ([[graft.plans.SrpBucket]], portable weights) bucket vectors; only
    * same-bucket candidates are scored — by the codegen'd
    * [[graft.plans.DotProduct]] — and the merge is the typed top-k
    * aggregate. The bucketing is engine-portable, so the oracle reproduces
    * it exactly; the whole query runs in whole-stage codegen (no HOFs). */
  def e3bLshAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.GraftFunctions.{dotProduct, srpBucket}
    val bucketed = load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), srpBucket(col("embedding"), 8).as("bucket"))
    val queries = bucketed.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("bucket"))
    val cands = bucketed.join(broadcast(queries), "bucket")
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos", dotProduct(col("embedding"), col("qvec")))
    topKPerQuery(cands, 5)
      .select(col("qid"), col("rk"), col("vec_id"))
      .orderBy("qid", "rk")
  }

  /** E18: scalar-quantized (int8) similarity search — the memory lever a
    * 100 TB vector corpus deploys: per-vector max-abs scaling to 8-bit
    * codes shrinks the resident index (and the scan's memory bandwidth) 4×
    * for a small quantization error. Codes are small integers, so every
    * dot product is INTEGER arithmetic carried exactly in doubles — scores
    * are bit-identical across engines (no float-summation tolerance at
    * all, unlike the float ANN variants), ties break on vec_id. Scoring
    * runs the native codegen'd [[graft.plans.DotProduct]] over the code
    * arrays; the merge is the typed bounded top-k aggregate. */
  def e18QuantizedAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.GraftFunctions.dotProduct
    val quant = load(s, dir, "embeddings")
      .withColumn("sc", expr("array_max(transform(embedding, x -> abs(cast(x as double)))) / 127.0"))
      // an all-zero vector has sc = 0: its codes are zeros (guards the ÷)
      .withColumn("qv", expr(
        """CASE WHEN sc = 0 THEN transform(embedding, x -> cast(0 as double))
          |     ELSE transform(embedding, x -> round(cast(x as double) / sc, 0)) END""".stripMargin))
      .withColumn("qn", dotProduct(col("qv"), col("qv")))
      .where(col("qn") > 0)
      .select("vec_id", "qv", "qn")
    val queries = quant.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("qv").as("qq"), col("qn").as("qqn"))
    val scored = quant.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos", dotProduct(col("qv"), col("qq")) / sqrt(col("qn") * col("qqn")))
    topKPerQuery(scored, 10)
      .select(col("qid"), col("rk"), col("vec_id"), round(col("cos"), 5).as("qcos"))
      .orderBy("qid", "rk")
  }

  /** E2: embedding-cosine near-duplicate pairs. Candidates come from the
    * signed-random-projection buckets (same family as [[e3bLshAnn]], coarse
    * 2-plane variant) — only same-bucket pairs are scored, never all-pairs —
    * then exact cosine filters at the threshold. Portable bucketing →
    * oracle-checked. */
  def e2dEmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.GraftFunctions.srpBucket
    val bucketed = load(s, dir, "embeddings")
      // coarse: 2 planes → 4 cells — high recall at the 0.3 bar
      .select(col("vec_id"), col("embedding"), srpBucket(col("embedding"), 2).as("bucket"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.embedding").as("ea"), col("b.embedding").as("eb"))
      // native codegen'd expression: the pair-scoring loop is the hot path
      .withColumn("cos", graft.plans.GraftFunctions.cosineSim(col("ea"), col("eb")))
      .where(col("cos") >= 0.3)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 5).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** E31: SEMANTIC DEDUP over the IVF cell structure (the SemDeDup
    * recipe): candidate pairs come only from WITHIN a coarse-quantizer
    * cell — the scoring bound is Σ cell², NEVER corpus² (at 100 TB the
    * quantizer's k scales up so cells stay capped; the per-cell self-join
    * is an equi-join shuffled on the cell key, so cells process in
    * parallel across executors) — and the removal rule is deterministic:
    * a vector with any smaller-id same-cell neighbor at cosine ≥ τ is
    * removed (keep-lowest-id representative, one pass, no iteration).
    * Pair scoring is the native codegen'd [[graft.plans.CosineSimilarity]].
    * Output: per-cell corpus/removed/kept counts; the oracle brute-force
    * replays the same in-cell pair set relationally. */
  def e31SemDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.GraftFunctions.cosineSim
    val (_, assigned, _) = ivfQuantizer(s, dir)
    val a = assigned.select(col("cell"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = assigned.select(col("cell"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    // corpus × corpus self-join: neither side is broadcastable at scale —
    // the shuffle_hash hint pins the plan the 100 TB run needs (pinned in
    // PlanAuditSpec), and the cell key spreads cells across reducers
    val removed = a.join(b.hint("shuffle_hash"), Seq("cell"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosineSim(col("ea"), col("eb")))
      .where(col("cos") >= 0.3)
      .select(col("cell"), col("vec_b").as("vec_id"))
      .distinct()
    assigned.groupBy("cell").agg(count(lit(1)).as("n_vectors"))
      .join(removed.groupBy("cell").agg(count(lit(1)).as("n_removed")), Seq("cell"), "left")
      .select(
        col("cell"),
        col("n_vectors"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        (col("n_vectors") - coalesce(col("n_removed"), lit(0L))).as("n_kept"))
      .orderBy("cell")
  }

  /** E3: per-label centroids via the typed [[graft.functions.VectorMeanAggregator]]
    * (IVF coarse-quantizer prototypes). Partial aggregation ships one
    * 64-slot buffer per label per map task. First four centroid dimensions
    * are oracle-checked. */
  def e3dLabelCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = load(s, dir, "embeddings")
      .select(col("label"), col("embedding")).as[(Int, Array[Float])]
    val agg = new graft.functions.VectorMeanAggregator(64)
    ds.groupByKey(_._1)
      .agg(agg.toColumn.name("centroid"))
      .toDF("label", "centroid")
      .select(
        col("label"),
        round(element_at(col("centroid"), 1), 5).as("c1"),
        round(element_at(col("centroid"), 2), 5).as("c2"),
        round(element_at(col("centroid"), 3), 5).as("c3"),
        round(element_at(col("centroid"), 4), 5).as("c4"))
      .orderBy("label")
  }

  /** E3 (IVF scale path): inverted-file ANN. The per-label centroids
    * ([[e3dLabelCentroids]]'s aggregator) act as the coarse quantizer;
    * every vector is assigned to its nearest cell, queries probe their two
    * nearest cells, and only same-cell candidates are scored. The classic
    * IVF trade: scoring work drops to (cells probed / total cells) of the
    * corpus, recall bounded by cell locality.
    *
    * Centroid components are rounded to 6 dp before use so cell assignment
    * is independent of float summation order (partial-agg merge order is
    * not deterministic) — which also makes the whole query reproducible by
    * the SQL oracle. The final merge is the typed top-k aggregate. */
  /** Shared IVF coarse quantizer (e3e rebuild-per-query; e29 persists it):
    * deterministic 6-dp label-mean centroids, nearest-cell assignment, and
    * 2-cell probes for the query vectors (vec_id < 5). Returns
    * (centroids, assigned, probes). */
  private[graft] def ivfQuantizer(
      s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    import graft.plans.GraftFunctions.cosineSim
    val emb = load(s, dir, "embeddings").select("vec_id", "embedding")

    // coarse quantizer: 10 cells from the typed centroid aggregator
    val cents = load(s, dir, "embeddings")
      .select(col("label"), col("embedding")).as[(Int, Array[Float])]
      .groupByKey(_._1)
      .agg(new graft.functions.VectorMeanAggregator(64).toColumn.name("centroid"))
      .toDF("cell", "centroid")
      .withColumn("centroid", expr("transform(centroid, x -> round(x, 6))"))

    // cell assignment: nearest centroid per vector (centroids broadcast);
    // the argmax window partitions by vec_id — corpus-cardinality key, so
    // it spreads over all reducers at any scale
    val simToCell = emb.crossJoin(broadcast(cents))
      .withColumn("sim", cosineSim(col("embedding"), col("centroid")))
    val byVec = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("cell"))
    val assigned = simToCell
      .withColumn("rk", row_number().over(byVec))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))

    // queries probe their 2 nearest cells
    val probes = simToCell
      .where(col("vec_id") < 5)
      .withColumn("rk", row_number().over(byVec))
      .where(col("rk") <= 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("cell"))
    (cents, assigned, probes)
  }

  def e3eIvfAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.GraftFunctions.cosineSim
    val (_, assigned, probes) = ivfQuantizer(s, dir)

    // score only candidates living in a probed cell
    val cands = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineSim(col("embedding"), col("qvec")))
    topKPerQuery(cands, 5)
      .select(col("qid"), col("rk"), col("vec_id"), round(col("cos"), 5).as("cos_sim"))
      .orderBy("qid", "rk")
  }

  /** E17: distributed k-means (Lloyd) over the embedding corpus — the
    * clustering pass behind semantic dedup, data-mixing diagnostics, and
    * training the coarse quantizer an IVF index probes. Each iteration is
    * ONE corpus pass: the centroid table (k×64 doubles — metadata-sized at
    * any corpus scale) broadcasts into a cross join scored by the native
    * codegen'd [[graft.plans.CosineSimilarity]], argmax lands on a
    * vec_id-partitioned window (corpus-cardinality key, spreads over all
    * reducers), and the new means come out of the typed partial-agg
    * [[graft.functions.VectorMeanAggregator]] — the shuffle carries one
    * 64-slot buffer per (cell × map task), never raw vectors, and nothing
    * corpus-sized ever reaches the driver.
    *
    * Determinism: seeding takes the k lowest vec_ids (reproducibility over
    * kmeans++ sampling), assignment ties break on the smaller cell id, and
    * centroid components round to 6 dp after every update so cell
    * assignment is independent of float partial-agg merge order — which
    * also lets the SQL oracle replay both iterations exactly. Residual
    * risk, accepted: a partial-agg mean landing WITHIN ~1 ulp of a 5e-7
    * rounding boundary could still flip the 6-dp grid between merge
    * orders; `DeterminismSpec` double-runs this query under different
    * shuffle partitioning to catch that empirically, and the inputs (a
    * fixed synthetic corpus) make the boundary event a measure-zero draw
    * rather than a moving target. */
  def e17Kmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.GraftFunctions.cosineSim
    val k = 8
    val emb = load(s, dir, "embeddings").select("vec_id", "embedding")
    val seed = emb.orderBy("vec_id").limit(k) // k rows: the window below is tiny
      .withColumn("cell", row_number().over(Window.orderBy("vec_id")) - 1)
      .select(
        col("cell"),
        expr("transform(embedding, x -> round(cast(x as double), 6))").as("centroid"))
    def assign(cents: DataFrame): DataFrame = {
      val byVec = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("cell"))
      emb.crossJoin(broadcast(cents))
        .withColumn("sim", cosineSim(col("embedding"), col("centroid")))
        .withColumn("rk", row_number().over(byVec))
        .where(col("rk") === 1)
        .select(col("vec_id"), col("embedding"), col("cell"))
    }
    def update(assigned: DataFrame): DataFrame =
      assigned.select(col("cell"), col("embedding")).as[(Int, Array[Float])]
        .groupByKey(_._1)
        .agg(new graft.functions.VectorMeanAggregator(64).toColumn.name("centroid"))
        .toDF("cell", "centroid")
        .withColumn("centroid", expr("transform(centroid, x -> round(x, 6))"))
    val trained = (1 to 2).foldLeft(seed)((cents, _) => update(assign(cents)))
    assign(trained)
      .groupBy("cell").agg(count(lit(1)).as("n_members"))
      .join(trained.select(col("cell"), round(element_at(col("centroid"), 1), 6).as("c1")), Seq("cell"))
      .select(col("cell").cast("long").as("cell"), col("n_members"), col("c1"))
      .orderBy("cell")
  }

  // ---------------------------------------------------------------- E4

  /** E4: multimodal column plumbing — an opaque binary payload column with
    * typed metadata extracted by the (stubbed) decoder in
    * [[graft.functions.Multimodal]]. Byte length and content hash are real;
    * width/height/frames come from the deterministic stub decode. */
  def e4MultimodalMeta(s: SparkSession, dir: String): DataFrame =
    graft.functions.Multimodal
      .decodeMeta(
        load(s, dir, "documents").select(
          col("doc_id"),
          col("text").cast("binary").as("payload")))
      .orderBy("doc_id")

  /** E4: frame sampling over video-like payloads — every 2nd frame index up
    * to the stub-decoded frame count. */
  def e4bFrameSample(s: SparkSession, dir: String): DataFrame =
    graft.functions.Multimodal
      .sampleFrames(
        load(s, dir, "documents").select(
          col("doc_id"), col("text").cast("binary").as("payload")),
        stride = 2)
      .orderBy("doc_id", "frame_idx")

  /** E4: batched binary→binary resize (stub codec, real plumbing); the
    * size accounting is oracle-checked. */
  def e4cResize(s: SparkSession, dir: String): DataFrame =
    graft.functions.Multimodal
      .resize(
        load(s, dir, "documents").select(
          col("doc_id"), col("text").cast("binary").as("payload")),
        maxDim = 64)
      .select("doc_id", "resized_bytes")
      .orderBy("doc_id")

  /** E4: perceptual-hash near-dup over BINARY payloads — the image-dedup
    * shape: a 16-bit block-mean pHash per payload
    * ([[graft.functions.Multimodal.perceptualHash]], partition-local), then
    * candidate pairs = payloads sharing the hash bucket via an aliased
    * self-join (one exchange on the 16-bit key; bucket sizes are bounded by
    * hash balance, never O(n²)). The hash arithmetic is integer sums +
    * one double division per block, so the oracle reproduces every bit. */
  def e4ePerceptualDedup(s: SparkSession, dir: String): DataFrame = {
    val ph = graft.functions.Multimodal.perceptualHash(
      load(s, dir, "documents").select(
        col("doc_id"), col("text").cast("binary").as("payload")))
    ph.as("a").join(ph.as("b"),
        col("a.phash16") === col("b.phash16") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** E4: the REAL image codec end-to-end (JDK `javax.imageio`, PNG) —
    * every stage below a true encoder/decoder, nothing stubbed: each doc
    * gets a deterministic RGB image (dimensions and pixels are integer
    * functions of doc_id), PNG-ENCODED in one partition-local pass,
    * PNG-DECODED in another (dims + exact per-channel pixel sums), then
    * nearest-neighbour 2×-downsampled THROUGH the codec (decode → integer
    * resample → re-encode → re-decode). PNG is lossless, so the oracle
    * recomputes every output from the generator formula alone — if the
    * codec corrupted a single pixel anywhere, a channel sum mismatches.
    * Scale shape: map-only; encoders/decoders amortize per partition. */
  def e4fRealCodec(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // NOTE: call the codec via the fully-qualified module inside the
    // closure — a local alias val would capture (and try to serialize)
    // the whole object
    import graft.functions.{Multimodal => M}
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width_px", LongType, nullable = false),
      StructField("height_px", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false),
      StructField("half_width_px", LongType, nullable = false),
      StructField("half_height_px", LongType, nullable = false),
      StructField("half_sum_r", LongType, nullable = false)))
    val rows = load(s, dir, "documents").select("doc_id").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = ((16 + id % 32).toInt, (16 + id % 24).toInt)
        // pixel formula mirrored EXACTLY by the oracle's SQL arithmetic
        val png = M.pngEncode(w, h, (x, y) => {
          val red = ((id * 7 + x * 3 + y * 5) % 256).toInt
          val green = (x * 11 + y) % 256
          val blue = ((id + x + y * 13) % 256).toInt
          (red << 16) | (green << 8) | blue
        })
        val f = M.pngDecodeFeatures(png)
        val hf = M.pngDecodeFeatures(M.pngHalve(png))
        Row(id, f.width.toLong, f.height.toLong, f.sumR, f.sumG, f.sumB,
          hf.width.toLong, hf.height.toLong, hf.sumR)
      }
    }
    s.createDataFrame(rows, outSchema).orderBy("doc_id")
  }

  /** E4: codec-free feature extraction — byte-histogram Shannon entropy of
    * each payload. The fixed-order bin loop is deterministic, and the text
    * payloads are ASCII, so the oracle reproduces it byte-for-byte. */
  def e4dByteEntropy(s: SparkSession, dir: String): DataFrame =
    graft.functions.Multimodal
      .byteEntropy(
        load(s, dir, "documents").select(
          col("doc_id"), col("text").cast("binary").as("payload")))
      .select(col("doc_id"), round(col("entropy_bits"), 6).as("entropy_bits"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- E5

  /** E5: per-document text statistics — token counts, type-token ratio,
    * stopword ratio (quality signals). One scan, no shuffle. */
  def e5TokenStats(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextAnalysis
    val stopwords = Seq("the", "a", "of", "and", "to")
    load(s, dir, "documents")
      .withColumn("tk", TextAnalysis.tokens(col("text")))
      .select(
        col("doc_id"),
        col("n_chars"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(array_distinct(col("tk"))).cast("long").as("n_uniq"),
        round(TextAnalysis.stopwordRatio(col("text"), stopwords), 6).as("stop_ratio"),
        round(TextAnalysis.typeTokenRatio(col("text")), 6).as("ttr"))
      .orderBy("doc_id")
  }

  /** E5: corpus language distribution. */
  def e5bLangStats(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        round(avg("n_chars"), 4).as("avg_chars"))
      .orderBy("lang")

  /** E5: global token frequency top-20 (explode + hash agg; the classic
    * shuffle-on-token shape that scales linearly). */
  def e5cTokenFreq(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(20)

  /** E5: corpus-frequency quality score — mean log corpus frequency of a
    * document's tokens (a cheap unigram-LM proxy: texts of rare tokens score
    * low, formulaic texts high). Explode → join the global frequency table →
    * per-doc mean. No broadcast hint: a web-scale vocabulary is not
    * broadcastable, and both sides are already hashed on the token key, so
    * the optimizer picks broadcast at toy scale and shuffle at corpus scale
    * from size stats — the right call at both ends. */
  def e5fDocQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val freq = toks.groupBy("token").agg(count(lit(1)).as("tf"))
    toks.join(freq, "token")
      .groupBy("doc_id")
      .agg(round(avg(log(col("tf").cast("double"))), 6).as("mean_log_tf"))
      .orderBy("doc_id")
  }

  /** E10: per-document tf-idf top terms — the classic keyword-extraction /
    * feature-weighting pass of a training-data pipeline. Term frequencies
    * and document frequencies are two hash aggregations; the doc count
    * joins as a broadcast single row; ranking uses only integer keys
    * (tf desc, df asc, token) so order is FP-free and engine-portable, and
    * the per-doc window partitions on `doc_id` — corpus-cardinality, so it
    * spreads over all reducers at any scale. The token join carries no
    * broadcast hint for the same reason as [[e5fDocQuality]]: a web-scale
    * vocabulary is not broadcastable. */
  def e10TfIdf(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val byDoc = Window.partitionBy("doc_id").orderBy(desc("tf"), asc("df"), asc("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("rk", row_number().over(byDoc).cast("long"))
      .where(col("rk") <= 3)
      .select(
        col("doc_id"), col("rk"), col("token"),
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 4).as("tfidf"))
      .orderBy("doc_id", "rk")
  }

  /** E11: intra-document repetition ratio — the fraction of a document's
    * word 3-grams that are repeats (1 − distinct/total), the classic
    * "excessively repetitive text" quality filter of LLM data pipelines.
    * Entirely row-local (one native shingle pass per doc, zero exchanges
    * except the presentation sort); total shingles is plain arithmetic on
    * the token count, distinct shingles is the native [[graft.plans.ShingleHashes]]
    * (already deduplicated). Oracle counts distinct 3-gram STRINGS — the
    * same string↔64-bit-hash equivalence the e2 inverted index rests on. */
  def e11Repetition(s: SparkSession, dir: String): DataFrame = {
    val tk = split(col("text"), " ")
    load(s, dir, "documents")
      .select(
        col("doc_id"),
        greatest(size(tk) - 2, lit(0)).cast("long").as("n_shingles"),
        size(graft.plans.GraftFunctions.shingleHashes(tk)).cast("long").as("n_distinct"))
      .where(col("n_shingles") > 0)
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_shingles"), 6))
      .orderBy("doc_id")
  }

  /** E12: benchmark-contamination check — for every training document, the
    * fraction of its distinct 3-grams that also appear in a held-out
    * benchmark set (here: every 10th doc stands in for the benchmark).
    * The shape is the decontamination pass every LLM training pipeline
    * runs before training: distinct shingle hashes per side, one
    * hash-equi semi-join (no broadcast hint — a real benchmark suite's
    * n-gram set may still be millions of rows), then per-doc overlap
    * counts. Linear in corpus size, never O(n²). */
  def e12Contamination(s: SparkSession, dir: String): DataFrame = {
    val sh = load(s, dir, "documents")
      .select(
        col("doc_id"),
        explode(graft.plans.GraftFunctions.shingleHashes(split(col("text"), " "))).as("shh"))
    val bench = sh.where(col("doc_id") % 10 === 0).select("shh").distinct()
    val train = sh.where(col("doc_id") % 10 =!= 0)
    val shared = train.join(bench, Seq("shh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    train.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("contamination",
        round(col("n_shared").cast("double") / col("n_grams"), 6))
      .select("doc_id", "n_grams", "n_shared", "contamination")
      .orderBy("doc_id")
  }

  /** E5: BPE-ish regex token count (letters runs / digit runs / other). */
  def e5dRegexTokens(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(
        col("doc_id"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).cast("long").as("n_bpeish"))
      .orderBy("doc_id")

  /** E5: n-gram language-ID heuristic (graft.functions.TextAnalysis). The
    * marker-count scoring is literal-substring arithmetic, mirrored exactly
    * by the SQL oracle. */
  def e5eLangGuess(s: SparkSession, dir: String): DataFrame =
    graft.functions.TextAnalysis
      .withLangGuess(load(s, dir, "documents"), col("text"))
      .groupBy("lang_guess")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang_guess")

  /** E2 (resolution): duplicate clusters from the Jaccard near-dup pairs —
    * connected components via [[graft.functions.DupClusters]] (iterative
    * min-label propagation: equi-join + agg per round, diameter-bounded
    * round count). cluster_id = least doc_id of the component, i.e. the
    * representative a dedup pass would keep. */
  def e7DupClusters(s: SparkSession, dir: String): DataFrame =
    dupComponents(s, dir)
      .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
      .orderBy("doc_id")

  /** E28: QUALITY-AWARE near-dup removal — the production canonical-
    * selection policy e27 simplifies away: within each duplicate cluster
    * keep the member with the RICHEST vocabulary (distinct-token count)
    * instead of the lowest id — dedup should discard the truncated/mangled
    * copies, not whichever happened to arrive first. The score is an
    * INTEGER (no new FP-determinism surface), ties break on lowest doc_id.
    * Clusters come from the shared memoized pair stage + label
    * propagation; the quality agg is one partial+final hash agg; canonical
    * selection is a window partitioned on the cluster id
    * (cluster-cardinality key — spreads over all reducers); removal is the
    * same shuffled anti-join as e27. */
  def e28QualityDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    // ROW-LOCAL quality: distinct-token count needs no corpus explode or
    // distinct-agg shuffle — the same integer as countDistinct over an
    // exploded token table, computed map-only (the e5 pattern); the join
    // below then ships only (doc_id, q) pairs, never tokens
    val quality = docs.select(
      col("doc_id"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("q"))
    val members = dupComponents(s, dir)
    val byCluster = Window.partitionBy("cluster").orderBy(desc("q"), asc("id"))
    val dropped = members
      .join(quality, members("id") === quality("doc_id"))
      .withColumn("rk", row_number().over(byCluster))
      .where(col("rk") =!= 1) // keep rank-1 (max quality, then min id)
      .select(col("id").as("doc_id"))
    docs
      .join(dropped.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum("doc_id").as("id_checksum"))
      .orderBy("source")
  }

  /** E8: incremental exact dedup — a NEW batch (odd doc_ids stand in for
    * today's arrivals) deduped against the EXISTING corpus (even doc_ids)
    * by content-hash anti-join: the shape every production ingest runs,
    * where the corpus side is a stored fingerprint table and arrivals never
    * trigger an all-corpus rescan. Only 256-bit hashes shuffle. */
  def e8IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents").withColumn("h", sha2(col("text"), 256))
    val corpus = docs.where(col("doc_id") % 2 === 0).select("h")
    docs.where(col("doc_id") % 2 === 1)
      .join(corpus, Seq("h"), "left_anti")
      .select("doc_id", "n_chars")
      .orderBy("doc_id")
  }

  /** E9: deterministic hash-based stratified sampling — the reproducible
    * way to subsample a training corpus. `rand()` draws differently on
    * every run/retry; an affine hash of the document key gives each doc a
    * STABLE pseudo-random cell in [0, 1000), and per-language rates then
    * keep different fractions per stratum (the data-mixing knob: here 10%
    * of English, 30% of everything else, upweighting the low-resource
    * strata). Map-only select + partial/final agg; the modular arithmetic
    * is portable, so the oracle reproduces the exact sample. */
  def e9StratifiedSample(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .withColumn("cell", expr("(doc_id * 2654435761 + 40503) % 1000000007 % 1000"))
      .where(
        (col("lang") === "en" && col("cell") < 100) ||
          (col("lang") =!= "en" && col("cell") < 300))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_sampled"),
        sum("doc_id").as("id_checksum"),
        sum("n_chars").as("sum_chars"))
      .orderBy("lang")

  /** E13: PII detection + redaction — the scrub pass a training-data
    * pipeline runs before anything else. The synthetic corpus carries no
    * natural PII, so the entry first composes a deterministic contact line
    * per document (email + phone derived from `doc_id`), then runs the real
    * operator: regex detection counts plus in-place redaction to `[EMAIL]` /
    * `[PHONE]` placeholders. Map-only (codegen'd regexp over each row, no
    * exchange except the presentation sort); the patterns are plain
    * character classes, identical under Java regex and RE2, so the oracle
    * reproduces counts and redacted text byte-for-byte. */
  def e13PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9]+@[a-z0-9.]+[a-z]"
    val phoneRe = "[0-9]{3}-[0-9]{4}"
    load(s, dir, "documents")
      .select(
        col("doc_id"),
        concat(
          col("text"), lit("contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or call 555-"),
          lpad((col("doc_id") * 7919 % 10000).cast("string"), 4, "0")).as("raw"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(col("raw"), emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]").as("clean"))
      .orderBy("doc_id")
  }

  /** E14: corpus bigram counts — the n-gram language-model statistics pass
    * (the same shape computes trigram LM counts or collocation tables).
    * Bigram expansion is row-local; the only exchange is the partial+final
    * count aggregation keyed by bigram (shuffle carries #distinct bigrams,
    * not corpus tokens), and the top-k lands in one TakeOrderedAndProject.
    * Ranking ties break on the bigram string so the top-20 is deterministic
    * across engines. */
  def e14BigramCounts(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> concat(element_at(tk, i + 1), ' ', element_at(tk, i + 2)))")).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("bigram"))
      .limit(20)

  /** E15: the end-to-end corpus-prep composition — the pipeline an LLM
    * training run actually materializes, as ONE query: exact dedup with a
    * keep-lowest-id policy (hash → min doc_id, the canonical-survivor rule),
    * language filter, quality thresholds (stopword ratio + length), then
    * the deterministic hash sample, ending in per-source corpus statistics.
    * Every stage is a shape proven by its standalone entry (e1, e5, e9);
    * the point here is that they compose into one plan — two hash-agg
    * shuffles (dedup, final stats) and map-only filters in between, no
    * materialization barriers. */
  def e15CorpusPrep(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val canonical = docs
      .withColumn("h", sha2(col("text"), 256))
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs
      // survivor ids are corpus-sized: shuffle join, never a broadcast
      .join(canonical.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
      .where(col("lang") === "en")
      .withColumn("tk", split(col("text"), " "))
      .withColumn("stop_ratio",
        size(expr("filter(tk, x -> x IN ('the', 'a', 'of', 'and', 'to'))")).cast("double") /
          size(col("tk")))
      .where(col("stop_ratio") >= 0.05 && col("n_chars") >= 100)
      .withColumn("cell", expr("(doc_id * 2654435761 + 40503) % 1000000007 % 1000"))
      .where(col("cell") < 500)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        round(avg(size(col("tk"))), 4).as("avg_tokens"))
      .orderBy("source")
  }

  /** E16: context-window chunking — split each document into fixed-width
    * token chunks with overlap (64-token windows, 48-token stride), the
    * sequence-prep pass that turns documents into training samples. All
    * row-local (one explode per document, chunk count = ⌈(n−w)/s⌉+1); the
    * only exchange is the presentation sort. Chunk text rides along so the
    * oracle's hash check covers the exact token spans, overlap included. */
  def e16Chunking(s: SparkSession, dir: String): DataFrame = {
    val width = 64
    val step = 48
    load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
           |  sequence(0, greatest(0, cast(ceil((size(tk) - $width) / cast($step as double)) as int))),
           |  i -> slice(tk, i * $step + 1, $width))""".stripMargin)))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** E24: candidate-quality evaluation — recall/precision of the MinHash+LSH
    * candidate generator (e2b) against the exact-Jaccard truth set (e2): the
    * measurement loop a production dedup pipeline runs before trusting an
    * approximate stage at corpus scale. Composes the two operator outputs
    * as-is (both engine-exact, so the oracle reproduces every count); the
    * result is three counts and two ratios — nothing corpus-sized leaves
    * the joins. */
  def e24LshRecall(s: SparkSession, dir: String): DataFrame = {
    // one full-outer join, one agg: each input plan evaluates ONCE (a
    // separate count per set would embed the whole LSH pipeline twice)
    val cand = e2bMinHashLsh(s, dir)
      .select(col("doc_a"), col("doc_b"), lit(1).as("is_cand"))
    val truth = e2JaccardNearDup(s, dir)
      .select(col("doc_a"), col("doc_b"), lit(1).as("is_truth"))
    cand.join(truth, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        count(col("is_cand")).as("n_candidates"),
        count(col("is_truth")).as("n_truth"),
        count(when(col("is_cand").isNotNull && col("is_truth").isNotNull, 1)).as("n_hit"))
      .withColumn("recall", round(col("n_hit") / col("n_truth"), 6))
      .withColumn("precision", round(col("n_hit") / col("n_candidates"), 6))
  }

  /** E25: language-ID confusion matrix — the second evaluation query (with
    * [[e24LshRecall]]): the n-gram language guesser (e5e) scored against
    * the corpus's ground-truth labels, per (truth, guess) cell. The
    * diagonal is per-language accuracy; off-diagonal cells say WHICH
    * confusions the heuristic makes — what decides whether a cheap
    * classifier can gate a corpus split. Map-only scoring + one count agg. */
  def e25LangConfusion(s: SparkSession, dir: String): DataFrame =
    graft.functions.TextAnalysis
      .withLangGuess(load(s, dir, "documents"), col("text"))
      .groupBy("lang", "lang_guess")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "lang_guess")

  /** E27: the NEAR-DUP removal pipeline end-to-end, as one query — the
    * full production dedup pass (the near-dup twin of `e15`'s exact-dedup
    * composition): exact-Jaccard-verified pairs (shared pair-counts stage)
    * → connected components → keep each cluster's representative (least
    * doc_id) → per-source stats of the deduplicated corpus. Removal is an
    * anti-join against the non-representative set (bounded by #duplicates,
    * joined by shuffle — at corpus scale it is not broadcastable). */
  def e27NearDupRemoval(s: SparkSession, dir: String): DataFrame = {
    val dropped = dupComponents(s, dir)
      .where(col("id") =!= col("cluster")) // non-representatives only
      .select(col("id").as("doc_id"))
    load(s, dir, "documents")
      .join(dropped.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum("doc_id").as("id_checksum"))
      .orderBy("source")
  }

  /** E26: MinHash calibration — the third evaluation query: over the LSH
    * candidate pairs, compare the SKETCH-estimated Jaccard (matching
    * signature components / 16) against the DF-capped exact Jaccard from
    * the shared pair-counts stage. Mean estimate, mean exact, and mean
    * absolute error say how much to trust the 16-permutation sketch before
    * sizing it up — the calibration step of deploying a sketch at corpus
    * scale. Signature comparison is a row-local zip over two 16-slot
    * arrays (an eval query over candidate pairs, not a corpus hot path);
    * signatures join by SHUFFLE on doc ids.
    *
    * DETERMINISM: every aggregate here sums in the INTEGER domain — the
    * match count `m` is a long, and `jexact` / the per-pair error are
    * snapped per-row to a fixed 1e-9 grid (`floor(x * 1e9)` as long)
    * before summation. Per-row doubles are order-free (IEEE ops on the
    * same inputs), integer sums are associative, and the single final
    * division+round sees one fixed scalar — so the 4-dp output can no
    * longer coin-flip with float summation order (the round-8 e26 flake). */
  def e26MinhashCalibration(s: SparkSession, dir: String): DataFrame = {
    // signatures RIDE the band rows into the aliased self-join (one corpus
    // signature pass, exchange reused on both sides) — joining them back
    // onto the e2b pair list would re-run the signature scan per join side
    val bands = minhashBands(load(s, dir, "documents"), carrySig = true)
    val est = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct() // same candidate set as e2b (sigs are doc-functional)
      .withColumn("m", expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), m -> m))").cast("long"))
      .select("doc_a", "doc_b", "m")
    val exact = shinglePairCounts(s, dir)
      .withColumn("jexact", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .select("doc_a", "doc_b", "jexact")
    est.join(exact, Seq("doc_a", "doc_b"), "left")
      .withColumn("jexact", coalesce(col("jexact"), lit(0.0)))
      .withColumn("jx_n", floor(col("jexact") * lit(1e9)))
      .withColumn("err_n",
        floor(abs(col("m").cast("double") / lit(16.0) - col("jexact")) * lit(1e9)))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(sum("m") / (count(lit(1)) * lit(16.0)), 4).as("mean_est"),
        round(sum("jx_n") / (count(lit(1)) * lit(1e9)), 4).as("mean_exact"),
        round(sum("err_n") / (count(lit(1)) * lit(1e9)), 4).as("mae"))
  }

  /** E22: n-gram novelty scoring — the cheap language-model quality filter
    * (a KenLM-perplexity stand-in): each document scores the mean surprise
    * `ln(c(w1 ·) / c(w1 w2))` of its bigrams under the corpus bigram model.
    * Low surprise = highly templated text, high surprise = noise; both
    * tails get filtered in production. Count tables are corpus-derived and
    * join by SHUFFLE on the bigram/prefix keys (never broadcast); the only
    * other exchanges are the two count aggs and the per-doc mean. */
  def e22NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val bigrams = load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(tk) - 2),
          |  i -> struct(element_at(tk, i + 1) AS w1, element_at(tk, i + 2) AS w2))""".stripMargin)).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bigramCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val prefixCounts = bigrams.groupBy("w1").agg(count(lit(1)).as("cp"))
    bigrams
      .join(bigramCounts.hint("shuffle_hash"), Seq("w1", "w2"))
      .join(prefixCounts.hint("shuffle_hash"), Seq("w1"))
      .withColumn("surprise", log(col("cp").cast("double") / col("cb")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg("surprise"), 4).as("avg_surprise"))
      .orderBy("doc_id")
  }

  /** E23: containment near-dup — the DIRECTIONAL overlap Jaccard misses:
    * a short document wholly quoted inside a long one scores
    * `|A∩B|/|A| ≈ 1` but a tiny Jaccard. A row-local derivation over the
    * SAME memoized pair-counts stage as e2/e7 (hashed shingles, DF cap,
    * row-local set sizes, no per-doc broadcast): both directed
    * containments, keeping pairs where either side is ≥ 0.8 contained. */
  def e23ContainmentDedup(s: SparkSession, dir: String): DataFrame =
    shinglePairCounts(s, dir)
      .withColumn("cont_a", col("c").cast("double") / col("na"))
      .withColumn("cont_b", col("c").cast("double") / col("nb"))
      .where(col("cont_a") >= 0.8 || col("cont_b") >= 0.8)
      .select(
        col("doc_a"), col("doc_b"),
        round(col("cont_a"), 6).as("cont_a"),
        round(col("cont_b"), 6).as("cont_b"))
      .orderBy("doc_a", "doc_b")

  /** E21: temperature-based data mixing — the corpus-mixture knob: source
    * sampling weights `p_s ∝ √n_s` (square-root temperature) flatten the
    * size distribution so low-resource sources are upweighted relative to
    * their share, then each document is kept by the DETERMINISTIC hash cell
    * (e9's portable arithmetic) against its source's integer acceptance
    * threshold, targeting 30% of the total character budget. Two tiny aggs
    * (per-source sizes, the normalizer) broadcast into a map-only filter —
    * the corpus-sized side never shuffles. Thresholds are rounded to
    * integers before the compare, so the sample is engine-exact. */
  def e21TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val bySrc = docs.groupBy("source").agg(sum("n_chars").cast("double").as("n_src"))
    val norm = bySrc.agg(
      sum(sqrt(col("n_src"))).as("z"), sum(col("n_src")).as("n_tot"))
    val rates = bySrc.crossJoin(broadcast(norm))
      .withColumn("thr",
        least(
          lit(1000.0),
          round(lit(1000.0) * lit(0.3) * col("n_tot") * sqrt(col("n_src"))
            / (col("z") * col("n_src")), 0)).cast("long"))
      .select("source", "thr")
    docs.join(broadcast(rates), Seq("source"))
      .withColumn("cell", expr("(doc_id * 2654435761 + 40503) % 1000000007 % 1000"))
      .where(col("cell") < col("thr"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        first("thr").as("thr"))
      .orderBy("source")
  }

  /** E20: sequence packing — bin documents into fixed-budget training
    * sequences (the pass that turns a chunked corpus into ~2048-token
    * training rows, minimizing padding). Greedy first-fit packing is
    * inherently sequential, so the distributed formulation shards the
    * corpus (32 shards here; thousands at 100 TB) and packs WITHIN each
    * shard by running token count: a shard-partitioned window computes the
    * cumulative sum in doc_id order and `seq = floor((cum − n) / budget)`
    * assigns each document to the sequence its PREFIX sum lands in —
    * deterministic, one shuffle on the shard key, every reducer handles one
    * shard's documents. Output: per-sequence document counts, token totals,
    * and padding waste (budget − fill, floored at 0 for overflowing
    * single-doc sequences). */
  def e20SequencePacking(s: SparkSession, dir: String): DataFrame = {
    val budget = 2048
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(s, dir, "documents")
      .select(
        col("doc_id"),
        (col("doc_id") % 32).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("seq", floor((col("cum") - col("n_tokens")) / budget).cast("long"))
      .groupBy("shard", "seq")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("fill_tokens"),
        greatest(lit(0L), lit(budget.toLong) - sum("n_tokens")).as("pad_tokens"))
      .orderBy("shard", "seq")
  }

  /** E19: span-level (paragraph) dedup — the C4/RefinedWeb-style pass that
    * measures REPEATED SPANS across documents, catching boilerplate and
    * templated passages whole-document dedup (e1) and near-dup (e2*) miss.
    * Spans are non-overlapping 32-token windows hashed by the native
    * codegen'd [[graft.plans.SpanHashes]] expression (one primitive pass
    * per document — no per-span slice allocation) — row-local expansion,
    * portable arithmetic. A span is "duplicated" when
    * its hash occurs in ≥ 2 distinct documents; the duplicated-hash set
    * comes from a two-level hash agg keyed by span hash (shuffle carries
    * #distinct spans) and joins back by SHUFFLE — at corpus scale the
    * duplicated-span table is not broadcastable. */
  def e19SpanDedup(s: SparkSession, dir: String): DataFrame = {
    val spans = load(s, dir, "documents")
      .select(
        col("doc_id"),
        explode(graft.plans.GraftFunctions.spanHashes(split(col("text"), " "), 32)).as("sh"))
    val dup = spans.groupBy("sh")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2)
      .select(col("sh"), lit(1).as("isdup"))
    spans.join(dup.hint("shuffle_hash"), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), count(col("isdup")).as("n_dup_spans"))
      .withColumn("dup_ratio", round(col("n_dup_spans") / col("n_spans"), 4))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- E6

  /** Document fingerprints: whole-text and 64-char-prefix xxhash64,
    * surfaced as a BOUNDED CLAIM the oracle can check (the q11 pattern —
    * the hash is engine-native, so its VALUES can't be oracle-compared,
    * but its contract can): a 64-bit fingerprint must be collision-free
    * on this corpus, so #distinct fingerprints == #distinct texts,
    * #distinct prefix fingerprints == #distinct 64-char prefixes, and the
    * explicit collision count is zero. One map + one map-side-combined
    * global agg — counts only ever reach the driver. Per-doc PORTABLE
    * fingerprints (value-checked row by row) are e6b's surface. */
  def e6Fingerprint(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(
        col("text"),
        xxhash64(col("text")).as("fp"),
        xxhash64(substring(col("text"), 1, 64)).as("fp_prefix64"))
      .agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("fp")).as("n_distinct_fp"),
        count_distinct(col("fp_prefix64")).as("n_distinct_prefix_fp"),
        (count_distinct(col("text")) - count_distinct(col("fp")))
          .as("n_fp_collisions"))

  /** E6: polynomial rolling hash `h = (h·31 + c) mod 1e9+7` over the
    * character codes — engine-portable (modular arithmetic, no overflow),
    * so this fingerprint IS oracle-checked, unlike the xxhash variant.
    * Pure map over the corpus. */
  def e6bRollingHash(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(
        col("doc_id"),
        expr(
          """aggregate(
            |  transform(sequence(1, length(text)), i -> cast(ascii(substr(text, i, 1)) as bigint)),
            |  0L, (h, c) -> (h * 31 + c) % 1000000007)""".stripMargin).as("rhash"))
      .orderBy("doc_id")

  /** Shared seeded shard hash of E32/E33: affine-mod over the doc id —
    * portable BIGINT arithmetic both engines compute bit-identically (no
    * overflow: doc_id·2654435761 ≪ 2⁶³ at any SF the fleet generates). */
  private def shardHash = expr("(doc_id * 2654435761 + 97) % 1000000007")
  private[queries] val NumShards = 8

  /** E32: DETERMINISTIC SHUFFLE-SHARD EXPORT — the training-data export
    * step: spread the corpus over N shards pseudo-randomly but
    * REPRODUCIBLY (seeded hash, not `rand()`), with a deterministic
    * within-shard order. This is the scale answer to "globally shuffle
    * 100 TB for training": no global sort — ONE hash exchange to shard
    * the corpus, then a per-shard local sort (Spark's window runs
    * per-partition once the exchange lands, shards process in parallel;
    * at fleet scale shard count ≫ executor count keeps every core busy).
    * Every (shard, position) assignment is value-checked by the oracle's
    * identical arithmetic — rerunning the export yields byte-identical
    * shards, the property that makes training runs reproducible. */
  def e32ShardExport(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), shardHash.as("h"))
      .withColumn("shard", col("h") % NumShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))).cast("long"))
      .select(col("shard"), col("pos"), col("doc_id"), col("n_chars"))
      .orderBy("shard", "pos")

  /** E33: CONCAT-AND-CHUNK SEQUENCE PACKING — the zero-padding
    * counterpart of [[e20SequencePacking]] (e20 keeps documents whole and
    * pads each sequence's tail; this concatenates the corpus in the
    * deterministic per-shard order of [[e32ShardExport]] and cuts every
    * `SeqLen` tokens, a document straddling a cut contributing a slice to
    * each side — the GPT-style packing that wastes zero tokens on
    * padding). Parallelism is the E32 story: the cumulative token offset
    * is a window sum WITHIN each shard — no global sequential state, so
    * 100 TB packs as thousands of independent shards. Each sequence's
    * token count is exactly `SeqLen` except a shard's last (asserted by
    * the oracle's identical replay, along with every doc/slice count). */
  def e33SequencePacking(s: SparkSession, dir: String): DataFrame = {
    val L = 128
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    load(s, dir, "documents")
      .select(col("doc_id"), shardHash.as("h"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("shard", col("h") % NumShards)
      .withColumn("off", coalesce(sum(col("n_tok")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // the sequences this doc overlaps: floor(off/L) .. floor((off+n-1)/L)
      .withColumn("seq_id", explode(expr(
        s"sequence(cast(floor(off / $L) as bigint), cast(floor((off + n_tok - 1) / $L) as bigint))")))
      .withColumn("slice_tokens",
        least(col("off") + col("n_tok"), (col("seq_id") + 1) * L) -
          greatest(col("off"), col("seq_id") * L))
      .groupBy(col("shard"), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("slice_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("shard", "seq_id")
  }

  /** E37: EDIT-DISTANCE fuzzy dedup — the eighth dedup family: LSH band
    * candidates (the e2b machinery — bounded buckets, never corpus²)
    * VERIFIED by Levenshtein distance, keeping pairs whose edit distance
    * is ≤ ¼ of the longer text (`dist·4 ≤ maxlen`, exact integer
    * arithmetic — no FP threshold edge). Character-level verification
    * catches near-dups token-set measures miss (reorderings score high
    * Jaccard; small in-place edits score low edit distance) and is the
    * standard last-pass check of fuzzy-matching pipelines.
    *
    * Scale shape: candidates come only from shared LSH band keys
    * (collision-probability-bounded); the O(len²) DP runs per CANDIDATE
    * pair, never per corpus pair, and Spark's thresholded Levenshtein
    * (banded DP, O(len·k)) is the drop-in lever when texts grow. */
  def e37EditDistanceDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents").select("doc_id", "text")
    val bands = minhashBands(docs)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .withColumn("mx", greatest(length(col("ta")), length(col("tb"))))
      .withColumn("dist", levenshtein(col("ta"), col("tb")))
      .where(col("dist") * 4 <= col("mx"))
      .select(
        col("doc_a"), col("doc_b"),
        col("dist").cast("long").as("edit_dist"),
        round(col("dist").cast("double") / col("mx"), 6).as("rel_dist"))
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------- E34 BM25

  /** Per-(qid, doc) BM25 contributions in exact micro-integer space (the
    * shared kernel of [[e34Bm25]] and the hybrid fusion [[e36HybridRrf]]).
    * Query terms: the first 4 tokens of docs 0/7/14/21 (qid = doc_id/7),
    * set semantics. Each per-(doc, term) contribution is deterministic
    * arithmetic scaled to a BIGINT (`round(1e6·x)`), so the per-doc SUM is
    * integer-exact and independent of aggregation order — no FP-summation
    * hash hazard against the oracle. k1 = 1.2, b = 0.75, BM25+ idf
    * (`ln(1 + (N − df + ½)/(df + ½))`, never negative).
    *
    * Scale shape: tf/df/dlen are corpus-keyed aggregates (token and doc_id
    * keys — partial+final, no vocabulary broadcast); the query-term set is
    * metadata-sized and broadcast; the global (N, avgdl) pair rides a
    * broadcast cross join. */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dlen"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dlen")).as("avgdl"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val q = docs.where(col("doc_id") % 7 === 0 && col("doc_id") < 28)
      .select(expr("doc_id div 7").as("qid"),
        explode(slice(split(col("text"), " "), 1, 4)).as("token"))
      .distinct()
    tf.join(broadcast(q), "token")
      .join(dfreq, "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("c", round(lit(1000000.0) *
          log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dlen") / col("avgdl"))), 0)
        .cast("long"))
      .groupBy("qid", "doc_id")
      .agg(sum("c").as("score_micro"))
  }

  /** E34: BM25 retrieval — score every document against each query-term
    * set and return the top 3 per query. The classic lexical half of a
    * retrieval/dedup stack (next to the dense [[e3CosineTopK]] family);
    * ranking keys are integers (micro-scaled score, doc_id tiebreak) so
    * the result is engine-exact. */
  def e34Bm25(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("score_micro"), asc("doc_id"))
    bm25Scores(s, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select("qid", "rk", "doc_id", "score_micro")
      .orderBy("qid", "rk")
  }

  // -------------------------------------------------- E35 bigram LM

  /** E35: n-gram language-model quality scoring (the CCNet/KenLM idea, with
    * the corpus itself as training data): a bigram LM with add-½ smoothing
    * over the full corpus — `P(w2|w1) = (c12 + ½)/(c1 + ½·V)` — scores each
    * sampled document's total log-probability. Low-probability documents
    * (token soup the corpus-wide LM finds surprising) are the filter
    * candidates. Per-bigram log-probs are micro-scaled BIGINTs, so per-doc
    * sums are exact and aggregation-order-free.
    *
    * Scale shape: LM "training" is two corpus aggregates (bigram and
    * unigram counts — partial+final on bounded keys); scoring joins ONLY
    * the sampled documents' bigram occurrences against the model (the
    * filter pushes below the joins); nothing is broadcast except the
    * 1-row vocab size. */
  def e35BigramLm(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val tk = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= 2)
    val bigrams = tk.select(col("doc_id"),
      explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i + 1] AS w2))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = tk.select(explode(col("tk")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v"))
    bigrams
      .where(col("doc_id") % 25 === 0) // score the sample, train on everything
      .join(c2, Seq("w1", "w2"))
      .join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("lp", round(lit(1000000.0) *
          log((col("c12") + 0.5) / (col("c1") + lit(0.5) * col("v"))), 0).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("logprob_micro"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------ E36 hybrid RRF

  /** E36: HYBRID retrieval — reciprocal-rank fusion of the lexical
    * ([[bm25Scores]] top 10) and dense (cosine top 10, the [[e3cCosineNative]]
    * kernel) rankings: `rrf = Σ round(1e6/(60 + rank))` over the systems
    * that retrieved the doc (the standard RRF k = 60). Fusion arithmetic
    * is integer-exact; only the dense rank order itself is FP (the same
    * accepted posture as the e3 family). Queries pair the first-4-token
    * term sets with the SAME documents' embeddings (vec 0/7/14/21).
    *
    * Scale shape: both retrieval legs are corpus-pass + bounded top-k;
    * fusion joins two ≤(k × #queries)-row sides — metadata-sized. */
  def e36HybridRrf(s: SparkSession, dir: String): DataFrame = {
    val wLex = Window.partitionBy("qid").orderBy(desc("score_micro"), asc("doc_id"))
    val lex = bm25Scores(s, dir)
      .withColumn("rank_lex", row_number().over(wLex).cast("long"))
      .where(col("rank_lex") <= 10)
      .select("qid", "doc_id", "rank_lex")

    val emb = load(s, dir, "embeddings").select("vec_id", "embedding")
    val queries = emb.where(col("vec_id") % 7 === 0 && col("vec_id") < 28)
      .select(expr("vec_id div 7").as("qid"), col("embedding").as("qvec"))
    val scored = emb.crossJoin(broadcast(queries))
      .withColumn("cos", graft.plans.GraftFunctions.cosineSim(col("embedding"), col("qvec")))
    val dense = topKPerQuery(scored, 10)
      .select(col("qid"), col("vec_id").as("doc_id"), col("rk").as("rank_dense"))

    lex.join(dense, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf_micro",
        when(col("rank_lex").isNotNull, round(lit(1000000.0) / (col("rank_lex") + 60), 0))
          .otherwise(lit(0L)).cast("long") +
        when(col("rank_dense").isNotNull, round(lit(1000000.0) / (col("rank_dense") + 60), 0))
          .otherwise(lit(0L)).cast("long"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("rrf_micro"), asc("doc_id"))).cast("long"))
      .where(col("rk") <= 3)
      .select("qid", "rk", "doc_id", "rrf_micro")
      .orderBy("qid", "rk")
  }
}
