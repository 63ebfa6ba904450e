package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.{Compaction, GraftTableCatalog, VersionContext, VersionedReader}
import graft.spark.VersionContext.DatasetVersionOps

/**
 * SCALE SOAK for the round-20 claims (run on demand; results land in
 * SOAK_r20.json):
 *
 * 1. SIZE-TARGETED OPTIMIZE. `compactToSize` bin-packs every scoped
 *    partition to ~target-sized files: the oversized partition splits to
 *    ≈ ceil(bytes/target) writers, small partitions still merge to one,
 *    and NO output file lands grossly above target — the "no 500 GB
 *    monolith" contract. Guards at 1× and 8×: split-count fidelity
 *    (within 2× of the byte-derived ideal), small-partition merge,
 *    bounded max output file size, and rewrite throughput holding
 *    within 4× as the corpus scales (a rewrite is linear in bytes —
 *    THROUGHPUT is the scale claim, not flatness).
 *
 * 1b. SIZE-CAPPED Z-ORDER (`OPTIMIZE … ZORDER BY … TARGET n MB`). The
 *    same skewed layout re-clusters instead of bin-packing: the hot
 *    partition lands as ~target-sized z-clustered files (never one
 *    monolith), small partitions stay ≤2 files (a range writer
 *    straddling tiny partitions still writes per-dir), output sizes
 *    stay bounded, and rewrite throughput holds at scale — one range
 *    shuffle, linear in bytes.
 *
 * 2. ARRAY-ELEMENT RENAME. `RENAME COLUMN tags.element.x TO score` is
 *    metadata-only at any scale: zero data files rewritten (the version
 *    dirs' file sets are untouched), statement wall-clock FLAT as the
 *    corpus scales 8×, and the transform-lambda mapped read returns the
 *    same aggregate over the renamed leaf as the pre-rename read did —
 *    correctness at volume, not just on the spec fixtures.
 *
 * Usage: SPARK_GRAFT_SOAK_SCALE=8 sbt "runMain graft.SoakRound20"
 * One JSON line per measurement + a summary; exits non-zero on violation.
 */
object SoakRound20 {

  private val user = UserId("soak-r20")

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

    def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
        dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).toSeq.filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))

    // ------------------------------------------ size-targeted OPTIMIZE
    // one SKEWED partition ("hot") holds ~90% of the bytes; the rest are
    // small — exactly the layout a global files-per-partition count
    // cannot serve
    def sizedRound(tag: String, mult: Int): (Double, Long, Int, Int, Long, Long) = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val t = TableDefinition(
        TableName("db", s"sized$tag"),
        Files.createTempDirectory(s"graft_soaksized_$tag").toUri,
        PartitionSchema(List(PartitionColumn("p"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      replicated(mult, li)
        .withColumn("p",
          when(col("l_orderkey") % 10 < 9, lit("hot"))
            .otherwise(concat(lit("cold"), col("l_orderkey") % 3)))
        .repartition(16) // fragment every partition
        .versionedInsertInto(ctx, t, user, UpdateMessage("v1: fragmented"))
      val fs = org.apache.hadoop.fs.FileSystem.get(t.location, hconf)
      val hotDirV1 = log.currentVersion(t.name) match {
        case PartitionedTableVersion(pvs) =>
          val p = pvs.keys.find(_.columnValues.head.value == "hot").get
          new org.apache.hadoop.fs.Path(
            graft.spark.SparkPaths.dirFor(t.location, p, pvs(p)))
        case other => sys.error(s"unexpected $other")
      }
      val hotBytes = dataFiles(fs, hotDirV1).map(_.getLen).sum
      val target = math.max(1L, hotBytes / 6) // want ~6 files for "hot"

      val (sec, _) = time(Compaction.compactToSize(
        spark, ctx, t, user, UpdateMessage("sized optimize"), target))

      val pvs = log.currentVersion(t.name) match {
        case PartitionedTableVersion(m) => m
        case other                      => sys.error(s"unexpected $other")
      }
      def filesOf(value: String): Seq[org.apache.hadoop.fs.FileStatus] = {
        val p = pvs.keys.find(_.columnValues.head.value == value).get
        dataFiles(fs, new org.apache.hadoop.fs.Path(
          graft.spark.SparkPaths.dirFor(t.location, p, pvs(p))))
      }
      val hotFiles = filesOf("hot")
      val coldCounts = Seq("cold0", "cold1", "cold2").map(filesOf(_).size)
      (sec, hotBytes, hotFiles.size, coldCounts.max,
        hotFiles.map(_.getLen).max, target)
    }

    sizedRound("w", 1) // warm-up, discarded
    val (sec1, bytes1, hot1, coldMax1, maxFile1, target1) = sizedRound("b", 1)
    val (secN, bytesN, hotN, coldMaxN, maxFileN, targetN) = sizedRound("s", scale)
    val tput1 = bytes1 / 1e6 / sec1
    val tputN = bytesN / 1e6 / secN
    println(f"""{"metric":"sized_optimize","base":{"sec":$sec1%.3f,"hot_bytes":$bytes1,"hot_files":$hot1,"cold_max_files":$coldMax1,"max_file_bytes":$maxFile1,"target":$target1,"mb_per_sec":$tput1%.1f},""" +
      f""""scaled_${scale}x":{"sec":$secN%.3f,"hot_bytes":$bytesN,"hot_files":$hotN,"cold_max_files":$coldMaxN,"max_file_bytes":$maxFileN,"target":$targetN,"mb_per_sec":$tputN%.1f},"scale":$scale}""")
    guard("sized_optimize_splits_hot", hot1 >= 3 && hot1 <= 12 && hotN >= 3 && hotN <= 12,
      s"the hot partition must split to ~6 target-sized files (got $hot1 base, $hotN scaled)")
    guard("sized_optimize_merges_cold", coldMax1 == 1 && coldMaxN == 1,
      s"small partitions must merge to one file (got $coldMax1 base, $coldMaxN scaled)")
    guard("sized_optimize_bounded_files",
      maxFile1 <= (target1 * 5) / 2 && maxFileN <= (targetN * 5) / 2,
      f"no output file may land grossly above target (base $maxFile1 vs $target1, scaled $maxFileN vs $targetN)")
    guard("sized_optimize_throughput_holds", tputN >= tput1 / 4.0,
      f"rewrite throughput $tputN%.1f MB/s at ${scale}x vs $tput1%.1f MB/s")

    // ---------------------------------------------- size-capped Z-ORDER
    // same skewed layout, but the rewrite is OPTIMIZE ZORDER + TARGET:
    // the hot partition must land as ~target-sized z-clustered files
    // (never one monolith), small partitions stay ≤2 files (a range
    // writer straddling two tiny partitions still writes per-dir), and
    // rewrite throughput holds as the corpus scales — a z-order is one
    // range shuffle, linear in bytes
    def zsizedRound(tag: String, mult: Int): (Double, Long, Int, Int, Long, Long) = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val t = TableDefinition(
        TableName("db", s"zsized$tag"),
        Files.createTempDirectory(s"graft_soakzsized_$tag").toUri,
        PartitionSchema(List(PartitionColumn("p"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      replicated(mult, li)
        .withColumn("p",
          when(col("l_orderkey") % 10 < 9, lit("hot"))
            .otherwise(concat(lit("cold"), col("l_orderkey") % 3)))
        .repartition(16)
        .versionedInsertInto(ctx, t, user, UpdateMessage("v1: fragmented"))
      val fs = org.apache.hadoop.fs.FileSystem.get(t.location, hconf)
      val hotDirV1 = log.currentVersion(t.name) match {
        case PartitionedTableVersion(pvs) =>
          val p = pvs.keys.find(_.columnValues.head.value == "hot").get
          new org.apache.hadoop.fs.Path(
            graft.spark.SparkPaths.dirFor(t.location, p, pvs(p)))
        case other => sys.error(s"unexpected $other")
      }
      val hotBytes = dataFiles(fs, hotDirV1).map(_.getLen).sum
      val target = math.max(1L, hotBytes / 6)

      val (sec, _) = time(graft.spark.ZOrder.zorderCompact(
        spark, ctx, t, user, UpdateMessage("sized zorder"),
        zorderCols = Seq("l_partkey", "l_quantity"), targetBytes = Some(target)))

      val pvs = log.currentVersion(t.name) match {
        case PartitionedTableVersion(m) => m
        case other                      => sys.error(s"unexpected $other")
      }
      def filesOf(value: String): Seq[org.apache.hadoop.fs.FileStatus] = {
        val p = pvs.keys.find(_.columnValues.head.value == value).get
        dataFiles(fs, new org.apache.hadoop.fs.Path(
          graft.spark.SparkPaths.dirFor(t.location, p, pvs(p))))
      }
      val hotFiles = filesOf("hot")
      val coldCounts = Seq("cold0", "cold1", "cold2").map(filesOf(_).size)
      (sec, hotBytes, hotFiles.size, coldCounts.max,
        hotFiles.map(_.getLen).max, target)
    }

    val (zsec1, zbytes1, zhot1, zcoldMax1, zmaxFile1, ztarget1) = zsizedRound("b", 1)
    val (zsecN, zbytesN, zhotN, zcoldMaxN, zmaxFileN, ztargetN) = zsizedRound("s", scale)
    val ztput1 = zbytes1 / 1e6 / zsec1
    val ztputN = zbytesN / 1e6 / zsecN
    println(f"""{"metric":"sized_zorder","base":{"sec":$zsec1%.3f,"hot_bytes":$zbytes1,"hot_files":$zhot1,"cold_max_files":$zcoldMax1,"max_file_bytes":$zmaxFile1,"target":$ztarget1,"mb_per_sec":$ztput1%.1f},""" +
      f""""scaled_${scale}x":{"sec":$zsecN%.3f,"hot_bytes":$zbytesN,"hot_files":$zhotN,"cold_max_files":$zcoldMaxN,"max_file_bytes":$zmaxFileN,"target":$ztargetN,"mb_per_sec":$ztputN%.1f},"scale":$scale}""")
    guard("sized_zorder_splits_hot", zhot1 >= 3 && zhot1 <= 14 && zhotN >= 3 && zhotN <= 14,
      s"the hot partition must z-cluster to ~6 target-sized files (got $zhot1 base, $zhotN scaled)")
    guard("sized_zorder_cold_bounded", zcoldMax1 <= 2 && zcoldMaxN <= 2,
      s"small partitions stay <=2 files under range straddle (got $zcoldMax1 base, $zcoldMaxN scaled)")
    guard("sized_zorder_bounded_files",
      zmaxFile1 <= (ztarget1 * 5) / 2 && zmaxFileN <= (ztargetN * 5) / 2,
      f"no z-ordered file may land grossly above target (base $zmaxFile1 vs $ztarget1, scaled $zmaxFileN vs $ztargetN)")
    guard("sized_zorder_throughput_holds", ztputN >= ztput1 / 4.0,
      f"z-order rewrite throughput $ztputN%.1f MB/s at ${scale}x vs $ztput1%.1f MB/s")

    // --------------------------------------------- array-element rename
    def renameRound(tag: String, mult: Int): (Double, Boolean, Boolean) = {
      val log = new InMemoryTableVersions
      spark.conf.set(
        s"spark.sql.catalog.soakar$tag", classOf[GraftTableCatalog].getName)
      GraftTableCatalog.bind(s"soakar$tag", log)
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val t = TableDefinition(
        TableName("db", s"ar$tag"),
        Files.createTempDirectory(s"graft_soakar_$tag").toUri,
        PartitionSchema(List(PartitionColumn("p"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      replicated(mult, li)
        .withColumn("tags", array(struct(
          col("l_quantity").cast("long").as("x"),
          col("l_partkey").cast("string").as("note"))))
        .select(col("l_orderkey"), col("tags"),
          (col("l_orderkey") % 8).cast("string").as("p"))
        .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
      GraftTableCatalog.register(s"soakar$tag", t)
      val name = s"soakar$tag.db.ar$tag"
      val pre = spark.sql(
        s"SELECT sum(tags[0].x) FROM $name").head().getLong(0)
      val filesBefore = VersionedReader(spark, log).read(t).inputFiles.toSet

      val (sec, _) = time(spark.sql(
        s"ALTER TABLE $name RENAME COLUMN tags.element.x TO score").collect())

      val filesAfter = spark.table(name).inputFiles.toSet
      val post = spark.sql(
        s"SELECT sum(tags[0].score) FROM $name").head().getLong(0)
      (sec, filesBefore == filesAfter, pre == post)
    }

    renameRound("w", 1) // warm-up, discarded
    val (ren1, untouched1, agree1) = renameRound("b", 1)
    val (renN, untouchedN, agreeN) = renameRound("s", scale)
    println(f"""{"metric":"array_element_rename","base":{"sec":$ren1%.3f},""" +
      f""""scaled_${scale}x":{"sec":$renN%.3f},"scale":$scale}""")
    guard("array_rename_zero_rewrite", untouched1 && untouchedN,
      "the rename must not touch a single data file at either scale")
    guard("array_rename_reads_agree", agree1 && agreeN,
      "the transform-lambda mapped read must return the pre-rename totals")
    guard("array_rename_flat", renN <= 2.0 * ren1 + 2.0,
      f"metadata-only rename: $renN%.2fs at ${scale}x vs $ren1%.2fs")

    println(s"""{"metric":"soak_r20_summary","scale":$scale,""" +
      s""""failed":[${failed.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
