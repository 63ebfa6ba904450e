package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.{GraftTableCatalog, VersionContext}
import graft.spark.VersionContext.DatasetVersionOps

/**
 * SCALE SOAK for the round-17 claims (run on demand, like [[Soak]] /
 * [[SoakMaintenance]]; results land in SOAK_r17.json):
 *
 * 1. STREAMED CDC APPLY: the merge-on-read upsert sink
 *    ([[graft.streaming.Streams.upsertSink]]) applies a CONSTANT-size
 *    keyed batch as DV pairs + overlay rows — O(changes) written + a
 *    bounded set of fixed passes (source materialize, discovery, clause
 *    join, two sidecar writes). Guard: FLATNESS — the apply cost at N×
 *    corpus ≤ 2 × the 1× cost (a hidden corpus-sized write would track
 *    the corpus). The copy-on-write merge sink is CONTEXT, not a guard:
 *    its extra cost is pure write amplification (it re-lands every
 *    matched partition), and a 3-partition local-NVMe rewrite is nearly
 *    free at sf0.1 — the asymmetry the overlay exists for shows at
 *    object-storage scale, not in a single-host page cache (the
 *    SOAK_r16 MOR-update parity posture).
 *
 * 2. REPLACE WHERE, PARTITION TIER IS ZERO-READ. A partition-scoped
 *    `INSERT INTO … REPLACE WHERE` resolves matched partitions from the
 *    fold's VALUES and never reads old data — so replacing one partition
 *    with a constant-size batch is FLAT in corpus size even as that
 *    partition grows. Guard: partition-tier cost(N×) ≤ 2 × cost(1×).
 *    Context (reported, not guarded): the general row-predicate tier on
 *    the same region reads + rewrites the touched partition, so it
 *    tracks the partition's size.
 *
 * 3. GENERATED-COLUMN PRUNING IS WHAT MAKES BASE-COLUMN QUERIES FLAT.
 *    The corpus scales by adding MONTHS (replica k shifts l_shipdate by
 *    k years) under `ship_month GENERATED ALWAYS AS (date_format(...))`;
 *    a one-month base-column query touches a constant slice, and the
 *    derived partition filter keeps the scan there. Guard: pruned
 *    query(N×) ≤ 2 × query(1×) while the full-scan aggregate (context)
 *    tracks the corpus.
 *
 * Usage: SPARK_GRAFT_SOAK_SCALE=8 sbt "runMain graft.SoakRound17"
 * Emits one JSON line per measurement + a summary; exits non-zero on a
 * guard violation.
 */
object SoakRound17 {

  private val user = UserId("soak-r17")

  private def time[T](body: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SOAK_SCALE", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.queries.Tables.load(spark, base, "lineitem")
    // disjoint-key replicas: same partition geometry, N× the rows
    def replicated(n: Int, df: DataFrame): DataFrame =
      (0 until n).map(k => df.withColumn(
        "l_orderkey", col("l_orderkey") + lit(k * 100000000L)))
        .reduce(_ unionByName _)

    var failed = List.empty[String]
    def guard(name: String, ok: Boolean, detail: String): Unit = {
      println(s"""{"check":"$name","ok":$ok,"detail":"$detail"}""")
      if (!ok) failed ::= name
    }

    // ------------------------------------------- streamed CDC apply (s20)
    // per-orderkey rollup partitioned by returnflag; ONE constant-size
    // keyed batch (first replica's %977 keys) applied via the MOR upsert
    // sink vs the CoW merge sink
    val rollupBase = li.groupBy("l_orderkey", "l_returnflag")
      .agg(sum("l_quantity").as("qty"))
    def upsertRound(tag: String, rows: DataFrame, mor: Boolean): Double = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val t = TableDefinition(
        TableName("db", s"ups$tag"),
        Files.createTempDirectory(s"graft_soakups_$tag").toUri,
        PartitionSchema(List(PartitionColumn("l_returnflag"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      rows.versionedInsertInto(ctx, t, user, UpdateMessage("preload"))
      val batch = rollupBase
        .where(col("l_orderkey") % 977 === 0)
        .withColumn("qty", col("qty") + 10000)
      val keys = Seq("l_orderkey", "l_returnflag")
      val (sec, _) = time {
        if (mor)
          graft.streaming.Streams.applyUpsertBatch(
            batch, 0L, ctx, log, t, keys, user, s"soak-$tag")
        else
          graft.streaming.Streams.applyMergeBatch(
            batch, 0L, ctx, log, t, keys, user, s"soak-$tag")
      }
      sec
    }

    upsertRound("w", rollupBase, mor = true) // warm-up, discarded
    val upsMor1 = upsertRound("mb", rollupBase, mor = true)
    val upsCow1 = upsertRound("cb", rollupBase, mor = false)
    val scaledRollup = replicated(scale, li).groupBy("l_orderkey", "l_returnflag")
      .agg(sum("l_quantity").as("qty"))
    val upsMorN = upsertRound("ms", scaledRollup, mor = true)
    val upsCowN = upsertRound("cs", scaledRollup, mor = false)
    println(s"""{"metric":"upsert_apply","base":{"mor":$upsMor1,"cow":$upsCow1},""" +
      s""""scaled_${scale}x":{"mor":$upsMorN,"cow":$upsCowN},"scale":$scale}""")
    guard("upsert_mor_flat",
      upsMorN <= 2.0 * upsMor1,
      f"scaled MOR apply $upsMorN%.2fs vs base $upsMor1%.2fs at scale $scale " +
        "(O(changes) + fixed passes; CoW context re-lands every matched partition)")

    // --------------------------------- REPLACE WHERE partition tier (q91)
    // 50-ary partition key; replace ONE partition with a CONSTANT batch.
    // The partition tier resolves the region from fold VALUES — no read.
    def rwRound(tag: String, rows: DataFrame, partitionTier: Boolean): Double = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val cat = s"soakrw$tag"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[GraftTableCatalog].getName)
      GraftTableCatalog.bind(cat, log)
      val t = TableDefinition(
        TableName("db", s"rw$tag"),
        Files.createTempDirectory(s"graft_soakrw_$tag").toUri,
        PartitionSchema(List(PartitionColumn("p"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      GraftTableCatalog.register(cat, t)
      rows.withColumn("p", (col("l_orderkey") % 50).cast("string"))
        .select("l_orderkey", "l_quantity", "l_returnflag", "p")
        .versionedInsertInto(ctx, t, user, UpdateMessage("preload"))
      li.where(col("l_orderkey") % 50 === 7 && col("l_quantity") <= 5)
        .withColumn("p", lit("7"))
        .select("l_orderkey", "l_quantity", "l_returnflag", "p")
        .createOrReplaceTempView(s"rw_src_$tag")
      val pred = if (partitionTier) "p = '7'" else "p = '7' AND l_quantity >= 0"
      val (sec, _) = time(spark.sql(
        s"INSERT INTO $cat.db.rw$tag REPLACE WHERE $pred SELECT * FROM rw_src_$tag"))
      sec
    }

    rwRound("w", li, partitionTier = true) // warm-up, discarded
    val rwPart1 = rwRound("pb", li, partitionTier = true)
    val rwGen1 = rwRound("gb", li, partitionTier = false)
    val rwPartN = rwRound("ps", replicated(scale, li), partitionTier = true)
    val rwGenN = rwRound("gs", replicated(scale, li), partitionTier = false)
    println(s"""{"metric":"replace_where","base":{"partition_tier":$rwPart1,"general_tier":$rwGen1},""" +
      s""""scaled_${scale}x":{"partition_tier":$rwPartN,"general_tier":$rwGenN},"scale":$scale}""")
    guard("replace_where_partition_tier_flat",
      rwPartN <= 2.0 * rwPart1,
      f"scaled partition-tier $rwPartN%.2fs vs base $rwPart1%.2fs " +
        "(zero-read: matched partitions resolve from fold values)")

    // ------------------------------------ generated-column pruning (q92)
    // scale adds MONTHS (replica k shifts shipdate k years); a one-month
    // base-column query stays constant-sized only because the derived
    // ship_month partition filter prunes the scan there
    def pruneRound(tag: String, replicas: Int): (Double, Double) = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val cat = s"soakgp$tag"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[GraftTableCatalog].getName)
      GraftTableCatalog.bind(cat, log)
      val t = TableDefinition(
        TableName("db", s"gp$tag"),
        Files.createTempDirectory(s"graft_soakgp_$tag").toUri,
        PartitionSchema(List(PartitionColumn("ship_month"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      graft.spark.GeneratedColumns.add(spark, ctx, t,
        graft.spark.GeneratedColumns.GeneratedColumn(
          "ship_month", "date_format(l_shipdate, 'yyyy-MM')"), user)
      GraftTableCatalog.register(cat, t)
      val shifted = (0 until replicas).map(k =>
        li.withColumn("l_shipdate",
          col("l_shipdate") + expr(s"INTERVAL ${k * 12} MONTHS")))
        .reduce(_ unionByName _)
      shifted.select("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
        .versionedInsertInto(ctx, t, user, UpdateMessage("preload"))
      val name = s"$cat.db.gp$tag"
      val (prunedSec, _) = time(spark.sql(
        s"""SELECT count(*), sum(l_quantity) FROM $name
           |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
           |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin)
        .collect())
      val (fullSec, _) = time(spark.sql(
        s"SELECT count(*), sum(l_quantity) FROM $name").collect())
      (prunedSec, fullSec)
    }

    pruneRound("w", 1) // warm-up, discarded
    val (gp1, gf1) = pruneRound("b", 1)
    val (gpN, gfN) = pruneRound("s", scale)
    println(s"""{"metric":"generated_pruning","base":{"one_month":$gp1,"full_scan":$gf1},""" +
      s""""scaled_${scale}x":{"one_month":$gpN,"full_scan":$gfN},"scale":$scale}""")
    guard("generated_pruning_flat",
      gpN <= 2.0 * gp1,
      f"scaled one-month query $gpN%.2fs vs base $gp1%.2fs at scale $scale " +
        "(derived ship_month filter keeps the scan in one month)")

    println(s"""{"metric":"soak_r17_summary","scale":$scale,""" +
      s""""failed":[${failed.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
