package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.{DeepClone, DeletionVectors, GraftTableCatalog, VersionContext, VersionedReader}
import graft.spark.VersionContext.DatasetVersionOps

/**
 * SCALE SOAK for the round-19 claims (run on demand; results land in
 * SOAK_r19.json):
 *
 * 1. DEEP CLONE RAW-COPY TIER. A sidecar-free state clones as a
 *    distributed per-file BYTE COPY — no decode/re-encode. Guards: the
 *    raw tier engages (audited), the clone's data bytes equal the
 *    source live state's bytes exactly, the raw copy is never
 *    materially slower than the resolved-rows tier on the SAME data
 *    (it skips the codec entirely), and copy bandwidth holds within 4×
 *    as the corpus scales 8× (it is a copy — cost is linear in bytes;
 *    BANDWIDTH is the scale claim, not flatness).
 *
 * 2. SINGLE-PASS PARTITION-MIGRATION UPDATE. The migrating UPDATE runs
 *    ONE direct file pass (the matched src+dst pair projection); the
 *    carried-partition probe and the rewrite read the persisted scoped
 *    scan. Guards: exactly one direct FileScan execution per statement
 *    at BOTH scales (QueryExecutionListener census), and wall-clock
 *    stays flat-ish when the partition count scales 8× at constant
 *    per-partition size (the matched pass prunes to the touched
 *    partitions).
 *
 * Usage: SPARK_GRAFT_SOAK_SCALE=8 sbt "runMain graft.SoakRound19"
 * One JSON line per measurement + a summary; exits non-zero on violation.
 */
object SoakRound19 {

  private val user = UserId("soak-r19")

  private def time[T](body: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  private def duBytes(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long =
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength

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
    val hconf = spark.sessionState.newHadoopConf()

    val li = graft.queries.Tables.load(spark, base, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    def replicated(n: Int, df: DataFrame): DataFrame =
      (0 until n).map(k => df.withColumn(
        "l_orderkey", col("l_orderkey") + lit(k * 100000000L)))
        .reduce(_ unionByName _)

    var failed = List.empty[String]
    def guard(name: String, ok: Boolean, detail: String): Unit = {
      println(s"""{"check":"$name","ok":$ok,"detail":"$detail"}""")
      if (!ok) failed ::= name
    }

    // ----------------------------------------- deep clone raw-copy tier
    def cloneRound(tag: String, mult: Int): (Double, Double, Long, Boolean, Boolean) = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val t = TableDefinition(
        TableName("db", s"deep$tag"),
        Files.createTempDirectory(s"graft_soakdeep_$tag").toUri,
        PartitionSchema(List(PartitionColumn("p"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      replicated(mult, li)
        .withColumn("p", (col("l_orderkey") % 16).cast("string"))
        .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
      val fs = org.apache.hadoop.fs.FileSystem.get(t.location, hconf)
      val liveBytes = VersionedReader(spark, log).read(t).inputFiles
        .map(f => fs.getFileStatus(
          new org.apache.hadoop.fs.Path(new java.net.URI(f))).getLen).sum

      // RAW tier: zero sidecar debt
      val rawLoc = Files.createTempDirectory(s"graft_soakdeep_raw_$tag")
      val (rawSec, rawDefn) = time(DeepClone.clone(
        spark, ctx, t, TableName("db", s"deepraw$tag"), rawLoc.toUri, user))
      val rawAudit = log.updates(rawDefn.name)
        .exists(_.message.content.contains("raw file copy"))
      val rawBytes = duBytes(fs, new org.apache.hadoop.fs.Path(rawLoc.toString))

      // RESOLVED tier on the same data: one DV pair forces it
      DeletionVectors.delete(
        ctx, log, t, col("l_orderkey") === 1L, user, UpdateMessage("dv"))
      val resLoc = Files.createTempDirectory(s"graft_soakdeep_res_$tag")
      val (resSec, resDefn) = time(DeepClone.clone(
        spark, ctx, t, TableName("db", s"deepres$tag"), resLoc.toUri, user))
      val resAudit = log.updates(resDefn.name)
        .exists(_.message.content.contains("raw file copy"))
      (rawSec, resSec, liveBytes, rawAudit && rawBytes == liveBytes, !resAudit)
    }

    cloneRound("w", 1) // warm-up, discarded
    val (raw1, res1, bytes1, rawOk1, resOk1) = cloneRound("b", 1)
    val (rawN, resN, bytesN, rawOkN, resOkN) = cloneRound("s", scale)
    val mbps1 = bytes1 / 1e6 / raw1
    val mbpsN = bytesN / 1e6 / rawN
    println(f"""{"metric":"deep_clone_raw","base":{"raw_sec":$raw1%.3f,"resolved_sec":$res1%.3f,"bytes":$bytes1,"mb_per_sec":$mbps1%.1f},""" +
      f""""scaled_${scale}x":{"raw_sec":$rawN%.3f,"resolved_sec":$resN%.3f,"bytes":$bytesN,"mb_per_sec":$mbpsN%.1f},"scale":$scale}""")
    guard("deep_clone_raw_tier_and_bytes", rawOk1 && rawOkN,
      "sidecar-free clones must take the raw tier and copy byte-exact totals")
    guard("deep_clone_resolved_on_debt", resOk1 && resOkN,
      "a DV-bearing source must NOT raw-copy")
    guard("deep_clone_raw_not_slower",
      raw1 <= res1 + 1.0 && rawN <= resN + 1.0,
      f"raw copy skips the codec: base $raw1%.2fs vs resolved $res1%.2fs, " +
        f"scaled $rawN%.2fs vs $resN%.2fs")
    guard("deep_clone_raw_bandwidth_holds", mbpsN >= mbps1 / 4.0,
      f"copy bandwidth $mbpsN%.1f MB/s at ${scale}x vs $mbps1%.1f MB/s")

    // ------------------------------- single-pass migration UPDATE (q102)
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { plans.add(qe.executedPlan.toString); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    def quiesce(): Unit = {
      var last = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        if (plans.size == last) stable += 1 else { stable = 0; last = plans.size }
      }
    }
    def migRound(tag: String, mult: Int): (Double, Int) = {
      val log = new InMemoryTableVersions
      spark.conf.set(
        s"spark.sql.catalog.soakmig$tag", classOf[GraftTableCatalog].getName)
      GraftTableCatalog.bind(s"soakmig$tag", log)
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val marker = s"soakmig_loc_$tag"
      val t = TableDefinition(
        TableName("db", s"mig$tag"),
        Files.createTempDirectory(s"graft_${marker}_").toUri,
        PartitionSchema(List(PartitionColumn("p"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      val parts = 6 * mult
      // constant PER-PARTITION size: rows scale with the partition count
      replicated(mult, li)
        .withColumn("p", concat(lit("p"), col("l_orderkey") % parts))
        .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
      GraftTableCatalog.register(s"soakmig$tag", t)
      plans.clear()
      val (sec, _) = time(spark.sql(
        s"UPDATE soakmig$tag.db.mig$tag SET p = 'moved' WHERE p = 'p0'").collect())
      quiesce()
      val mine = new java.util.ArrayList(plans)
      val direct = (0 until mine.size).map(mine.get)
        .count(p => p.contains(marker) && p.contains("FileScan") &&
          !p.contains("InMemoryTableScan"))
      (sec, direct)
    }
    spark.listenerManager.register(listener)
    val (mig1, scans1, migN, scansN) =
      try {
        migRound("w", 1) // warm-up, discarded
        val (a, b) = migRound("b", 1)
        val (c, d) = migRound("s", scale)
        (a, b, c, d)
      } finally spark.listenerManager.unregister(listener)
    println(f"""{"metric":"migration_update","base":{"sec":$mig1%.3f,"direct_scans":$scans1},""" +
      f""""scaled_${scale}x":{"sec":$migN%.3f,"direct_scans":$scansN},"scale":$scale}""")
    guard("migration_single_direct_scan", scans1 == 1 && scansN == 1,
      s"one matched pass per statement (got $scans1 base, $scansN scaled)")
    guard("migration_flat",
      migN <= 2.0 * mig1 + 2.0,
      f"partition-pruned migration $migN%.2fs at ${scale}x partitions vs $mig1%.2fs")

    println(s"""{"metric":"soak_r19_summary","scale":$scale,""" +
      s""""failed":[${failed.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
