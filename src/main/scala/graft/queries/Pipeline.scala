package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *  - similarity search broadcasts the (small) query set and does one pass
  *    over the corpus; the LSH-bucketed variant trades recall for a
  *    shuffle-free pre-filter.
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

  /** (doc_id, shingle) pairs: distinct word 3-grams per document. */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= 3)
      .select(
        col("doc_id"),
        explode(expr(
          "array_distinct(transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', slice(tk, i + 1, 3))))"
        )).as("sh"))

  /** E2: exact n-gram Jaccard near-dup pairs via an inverted shingle index.
    * Self-join on the shingle key (shuffle-based equi-join, never all-pairs)
    * → per-pair intersection counts → Jaccard = |∩| / (|A|+|B|-|∩|).
    *
    * Shingles occurring in more than [[MaxShingleDf]] documents are dropped
    * (stopword-shingles): they carry no near-dup signal and their buckets
    * grow O(df²) pair rows — the cap is what keeps the self-join linear in
    * corpus size. The oracle applies the identical cap. */
  val MaxShingleDf = 128

  def e2JaccardNearDup(s: SparkSession, dir: String): DataFrame = {
    // shuffle an 8-byte hash of each shingle, never the shingle text — at
    // 100 TB the inverted index is all shuffle traffic, and the 64-bit key
    // keeps it minimal (collision odds are negligible next to the DF cap)
    val sh0 = shingles(s, dir).select(col("doc_id"), xxhash64(col("sh")).as("shh"))
    val rare = sh0.groupBy("shh").agg(count(lit(1)).as("df"))
      .where(col("df") <= MaxShingleDf).select("shh")
    val sh = sh0.join(rare, "shh").cache()
    // per-doc set sizes: tiny (one row per doc) — broadcast both joins
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("doc_a"), col("shh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shh"))
    val common = a.join(b, Seq("shh")).where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    common
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")), "doc_a")
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")), "doc_b")
      .withColumn("jaccard", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .where(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** E2: MinHash + LSH banded candidate pairs. 16 hash functions in 4 bands
    * of 4; candidates = docs sharing a band key. Deterministic (xxhash64),
    * engine-specific hash family → no SQL oracle (rows-only check).
    * Scale: the only join is on (band, band key) — bucket sizes are bounded
    * by LSH collision probability, not corpus size. */
  def e2bMinHashLsh(s: SparkSession, dir: String): DataFrame = {
    val nHashes = 16
    val bandSize = 4
    val sh = shingles(s, dir)
    val sigCols = (0 until nHashes).map(p => min(xxhash64(col("sh"), lit(p))).as(s"h$p"))
    val sigs = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until nHashes / bandSize).map { band =>
      val hs = (0 until bandSize).map(j => col(s"h${band * bandSize + j}"))
      struct(lit(band).as("band"), hash(hs: _*).as("key")).as(s"b$band")
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = bands.select(col("doc_id").as("doc_a"), col("band"), col("key"))
    val r = bands.select(col("doc_id").as("doc_b"), col("band"), col("key"))
    l.join(r, Seq("band", "key")).where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** E2: 16-bit SimHash fingerprint per document (token-hash bit votes).
    * Computed entirely row-local with higher-order functions — zero
    * shuffle, so it scales as a pure map over the corpus. A bit is set when
    * more than half the token hashes have that bit set (majority vote; the
    * ±1-vote formulation `sum > 0` ⟺ `2·countSet > total`).
    * Engine-specific hash → rows-only check. */
  def e2cSimHash(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(
        col("doc_id"),
        expr(
          """aggregate(
            |  transform(sequence(0, 15), j ->
            |    CASE WHEN size(filter(tk, t -> ((xxhash64(t) >> j) & 1) = 1)) * 2 > size(tk)
            |         THEN shiftleft(1L, j) ELSE 0L END),
            |  0L, (a, x) -> a + x)""".stripMargin).as("simhash16"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- E3

  /** E3: brute-force top-k cosine similarity. The query set (5 vectors) is
    * broadcast; one scan over the corpus computes all query×corpus scores,
    * then a per-query top-k window. At 100 TB the same shape holds: queries
    * broadcast, corpus partition-local scoring, per-partition top-k before
    * the final merge. */
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
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10)
      .select(col("qid"), col("rk").cast("long").as("rk"), col("vec_id"), round(col("cos"), 5).as("cos_sim"))
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
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10)
      .select(col("qid"), col("rk").cast("long").as("rk"), col("vec_id"), round(col("cos"), 5).as("cos_sim"))
      .orderBy("qid", "rk")
  }

  /** E3 (scale path): LSH-bucketed approximate NN. Random-hyperplane signs
    * (derived from deterministic per-dimension hashes) bucket vectors; only
    * same-bucket candidates are scored. Engine-specific → rows-only check. */
  def e3bLshAnn(s: SparkSession, dir: String): DataFrame = {
    // 8 pseudo-random hyperplanes; sign bit h = Σ_d w(p,d)·x_d where
    // w(p,d) ∈ {-1,+1} from xxhash64(p, d). Deterministic, data-independent.
    val nPlanes = 8
    val emb = load(s, dir, "embeddings")
      .withColumn("dvec", expr("transform(embedding, x -> cast(x as double))"))
    val planeBits = (0 until nPlanes).map { p =>
      val dot = expr(
        s"""aggregate(
           |  zip_with(dvec, sequence(0, size(dvec) - 1),
           |           (x, d) -> x * (CASE WHEN (xxhash64($p, d) & 1) = 1 THEN 1.0 ELSE -1.0 END)),
           |  cast(0 as double), (a, x) -> a + x)""".stripMargin)
      when(dot > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    val bucketed = emb.withColumn("bucket", planeBits.reduce(_ + _)).select("vec_id", "dvec", "bucket")
    val queries = bucketed.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("dvec").as("qvec"), col("bucket"))
    val cands = bucketed.join(broadcast(queries), "bucket")
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos_num",
        expr("aggregate(zip_with(dvec, qvec, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)"))
    val w = Window.partitionBy("qid").orderBy(desc("cos_num"), asc("vec_id"))
    cands
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select(col("qid"), col("rk").cast("long").as("rk"), col("vec_id"))
      .orderBy("qid", "rk")
  }

  /** E2: embedding-cosine near-duplicate pairs. Candidates come from the
    * random-hyperplane LSH buckets (same family as [[e3bLshAnn]]) — only
    * same-bucket pairs are scored, never all-pairs — then exact cosine
    * filters at the threshold. Engine-specific bucketing → rows-only check. */
  def e2dEmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val nPlanes = 2 // coarse buckets: 4 cells — high recall at the 0.3 bar
    val emb = load(s, dir, "embeddings")
      .withColumn("dvec", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("norm", sqrt(expr("aggregate(dvec, cast(0 as double), (a, x) -> a + x * x)")))
    val planeBits = (0 until nPlanes).map { p =>
      val dot = expr(
        s"""aggregate(
           |  zip_with(dvec, sequence(0, size(dvec) - 1),
           |           (x, d) -> x * (CASE WHEN (xxhash64($p, d) & 1) = 1 THEN 1.0 ELSE -1.0 END)),
           |  cast(0 as double), (a, x) -> a + x)""".stripMargin)
      when(dot > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    val bucketed = emb.withColumn("bucket", planeBits.reduce(_ + _))
      .select("vec_id", "embedding", "bucket")
    val a = bucketed.select(
      col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = bucketed.select(
      col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, Seq("bucket")).where(col("vec_a") < col("vec_b"))
      // native codegen'd expression: the pair-scoring loop is the hot path
      .withColumn("cos", graft.plans.GraftFunctions.cosineSim(col("ea"), col("eb")))
      .where(col("cos") >= 0.3)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 5).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
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
    * corpus, recall bounded by cell locality. Deterministic; rows-only. */
  def e3eIvfAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.plans.GraftFunctions.cosineSim
    val emb = load(s, dir, "embeddings").select("vec_id", "embedding")

    // coarse quantizer: 10 cells from the typed centroid aggregator
    val cents = load(s, dir, "embeddings")
      .select(col("label"), col("embedding")).as[(Int, Array[Float])]
      .groupByKey(_._1)
      .agg(new graft.functions.VectorMeanAggregator(64).toColumn.name("centroid"))
      .toDF("cell", "centroid")

    // cell assignment: nearest centroid per vector (centroids broadcast)
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

    // score only candidates living in a probed cell
    val cands = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineSim(col("embedding"), col("qvec")))
    val byQuery = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    cands
      .withColumn("rk", row_number().over(byQuery))
      .where(col("rk") <= 5)
      .select(col("qid"), col("rk").cast("long").as("rk"), col("vec_id"), round(col("cos"), 5).as("cos_sim"))
      .orderBy("qid", "rk")
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

  /** E4: codec-free feature extraction — byte-histogram Shannon entropy of
    * each payload (rows-only: the per-bin float reduction is ours alone). */
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
    * low, formulaic texts high). Explode → join the global frequency table
    * (broadcast; vocabulary-sized) → per-doc mean. */
  def e5fDocQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val freq = toks.groupBy("token").agg(count(lit(1)).as("tf"))
    toks.join(broadcast(freq), "token")
      .groupBy("doc_id")
      .agg(round(avg(log(col("tf").cast("double"))), 6).as("mean_log_tf"))
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
    * guess is a deterministic function of character-bigram profiles —
    * engine-specific scoring → rows-only check. */
  def e5eLangGuess(s: SparkSession, dir: String): DataFrame =
    graft.functions.TextAnalysis
      .withLangGuess(load(s, dir, "documents"), col("text"))
      .groupBy("lang_guess")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang_guess")

  // ---------------------------------------------------------------- E6

  /** Document fingerprints: whole-text and prefix rolling hashes
    * (engine-specific hash → rows-only check). */
  def e6Fingerprint(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(
        col("doc_id"),
        xxhash64(col("text")).as("fp"),
        xxhash64(substring(col("text"), 1, 64)).as("fp_prefix64"))
      .orderBy("doc_id")

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
}
