package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * SCALE SOAK for the dedup/ANN §2.4 claims (run on demand, not per-round):
 * replicates the sf0.1 corpus N× (near-dup text replicas, perturbed
 * embeddings — so the candidate structure grows, not just the row count)
 * and times the four scale-critical operators at both sizes:
 *
 *  - e2_jaccard_neardup  — inverted index + MaxShingleDf cap
 *  - e2b_minhash_lsh     — banded LSH bucketing
 *  - e29_persisted_ivf   — IVF index build + partition-pruned probes
 *  - e30_ivf_ingest      — incremental O(batch) index maintenance
 *
 * The claim under test: runtime grows ≤ ~linearly in corpus size (the
 * bucketed candidate generation and the DF cap hold — no quadratic
 * all-pairs blowup hiding below the tested scale). A superlinear guard of
 * 2× the scale factor accommodates shuffle overheads and host steal; a
 * quadratic blowup at scale 5 would show ~25× and fail loudly.
 *
 * Usage: SPARK_GRAFT_SOAK_SCALE=5 sbt "runMain graft.Soak"
 * Emits one JSON line per operator + a summary line; exits non-zero on a
 * superlinear violation.
 */
object Soak {

  private val Queries = Seq(
    "e2_jaccard_neardup", "e2b_minhash_lsh", "e29_persisted_ivf", "e30_ivf_ingest")

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SOAK_SCALE", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val soakDir = java.nio.file.Files.createTempDirectory("graft_soak").toString

    val spark = SparkSession.builder()
      .appName("graft-soak")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- build the scaled corpus --------------------------------------
    // text replicas get a distinct suffix (near-dups of their original, so
    // shingle DF and bucket sizes grow with scale); embeddings get a
    // per-replica perturbation (distinct vectors, same cluster structure)
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    val scaledDocs = (0 until scale).map { k =>
      if (k == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(k * maxDoc))
        .withColumn("text", concat(col("text"), lit(s" replica$k")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
    scaledDocs.write.mode("overwrite").parquet(s"$soakDir/documents.parquet")

    val embs = spark.read.parquet(s"$base/embeddings.parquet")
    val maxVec = embs.agg(max("vec_id")).head().getLong(0) + 1
    val scaledEmbs = (0 until scale).map { k =>
      if (k == 0) embs
      else embs
        .withColumn("vec_id", col("vec_id") + lit(k * maxVec))
        .withColumn("embedding",
          transform(col("embedding"), x => (x + lit(k * 1e-4f)).cast("float")))
    }.reduce(_ unionByName _)
    scaledEmbs.write.mode("overwrite").parquet(s"$soakDir/embeddings.parquet")

    // ---- time each operator at both sizes -----------------------------
    def timeQuery(name: String, dir: String): (Double, Long) = {
      graft.queries.Pipeline.clearPairStageCache()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // untimed warmup: absorb JVM/codegen/shuffle-service startup so the
    // base-vs-scaled comparison is steady-state (a cold first measurement
    // inflates base_sec and understates the growth ratio — the soak's
    // failure direction)
    Queries.foreach { name =>
      graft.queries.Pipeline.clearPairStageCache()
      SparkEntry.queries(name)(spark, base).count()
    }

    var violations = 0
    val results = Queries.map { name =>
      val (baseSec, baseRows) = timeQuery(name, base)
      val (scaledSec, scaledRows) = timeQuery(name, soakDir)
      val ratio = scaledSec / math.max(baseSec, 0.001)
      // superlinear guard: 2× headroom over proportional growth
      val ok = ratio <= scale * 2.0
      if (!ok) violations += 1
      val line =
        f"""{"query":"$name","base_sec":$baseSec%.2f,"scaled_sec":$scaledSec%.2f,""" +
          f""""scale":$scale,"ratio":$ratio%.2f,"base_rows":$baseRows,""" +
          f""""scaled_rows":$scaledRows,"linear_ok":$ok}"""
      println(line)
      line
    }
    println(
      s"""{"metric":"soak","scale":$scale,"violations":$violations,""" +
        s""""queries":${Queries.size},"base":"$base"}""")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("SOAK_r11.json"),
      (results :+ s"""{"metric":"soak","scale":$scale,"violations":$violations}""")
        .mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception => System.err.println(s"[soak] SOAK_r11.json: $e") }
    spark.stop()
    if (violations > 0) sys.exit(1)
  }
}
