package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.core.TableVersions.{UpdateMessage, UserId}
import graft.spark.{DeletionVectors, MaterializedView, PartitionEvolution, VersionContext}
import graft.spark.VersionContext.DatasetVersionOps

/**
 * SCALE SOAK for the round-14 maintenance claims (run on demand, like
 * [[Soak]]; results land in SOAK_r14.json):
 *
 * 1. MV INCREMENTAL REFRESH IS NEVER O(source). The falsifiable SCALE
 *    claim is FLATNESS: the refresh cost is bounded by the changed set +
 *    the touched groups' rows + fixed stage overheads, NONE of which grow
 *    with the untouched remainder — so scaling the corpus N× with the
 *    delete held constant must leave the incremental cost ~flat while
 *    the FULL rebuild tracks the corpus. Guard: incremental(N×) ≤ 2 ×
 *    incremental(1×) (a refresh that secretly re-scanned the source
 *    would grow ~N×). NB at local sf0.1 sizes the fixed overheads of the
 *    feed pipeline exceed one in-cache source scan, so full-vs-
 *    incremental ABSOLUTE comparisons measure constants, not asymptotics
 *    — the reported full times are context, not a guard.
 *
 * 2. PARTITION EVOLUTION IS ONE LINEAR SHUFFLE. Claim: the boundary
 *    rewrite costs one repartition of the live rows — linear in corpus
 *    size. Measured: evolve seconds at 1× and REPLICA×. Guard: scaled ≤
 *    2 × scale × base (the [[Soak]] disjoint-regime headroom; a
 *    quadratic blowup at scale 4 would show ~16×).
 *
 * 3. THE METADATA-ONLY BOUNDARY IS O(metadata) (round 15,
 *    [[graft.spark.PartitionEvolution.evolveMetadataOnly]]). Claim: the
 *    boundary commit reads no data and moves no dir, so its cost is FLAT
 *    in corpus size. Guard: boundary(N×) ≤ 2 × boundary(1×). Context
 *    (reported, not guarded): the era-union read over the mixed fold and
 *    the deferred consolidation (the linear rewrite of claim 2).
 *
 * Usage: SPARK_GRAFT_SOAK_SCALE=4 sbt "runMain graft.SoakMaintenance"
 * Emits one JSON line per measurement + a summary; exits non-zero on a
 * guard violation.
 */
object SoakMaintenance {

  private val user = UserId("soak-maint")

  private def time[T](body: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SOAK_SCALE", "4").toInt
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
      .select("l_orderkey", "l_quantity", "l_returnflag", "l_linestatus")
    // replicas shift the order keys into disjoint ranges: same group
    // geometry (returnflag/linestatus), N× the rows
    def replicated(n: Int): DataFrame =
      (0 until n).map(k => li.withColumn(
        "l_orderkey", col("l_orderkey") + lit(k * 100000000L)))
        .reduce(_ unionByName _)

    var failed = List.empty[String]
    def guard(name: String, ok: Boolean, detail: String): Unit = {
      println(s"""{"check":"$name","ok":$ok,"detail":"$detail"}""")
      if (!ok) failed ::= name
    }

    // ---------------------------------------------------------------- MV
    // the corpus carries a 1000-ary bucket key so the touched-group
    // fraction stays ~0.1% at every scale, and the delete is confined to
    // the FIRST replica's key range so the changed set is CONSTANT — the
    // two premises of the flatness claim
    def mvRound(tag: String, rows: DataFrame): (Double, Double) = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val cat = s"soakmv$tag"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.spark.GraftTableCatalog].getName)
      graft.spark.GraftTableCatalog.bind(cat, log)
      val t = TableDefinition(
        TableName("db", s"mvsrc$tag"),
        Files.createTempDirectory(s"graft_soakmv_$tag").toUri,
        PartitionSchema(List(PartitionColumn("l_returnflag"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      graft.spark.GraftTableCatalog.register(cat, t)
      rows.withColumn("l_bucket", col("l_orderkey") % 1000)
        .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
      val mvLoc = Files.createTempDirectory(s"graft_soakmv_loc_$tag").toUri
      spark.sql(
        s"""CREATE MATERIALIZED VIEW $cat.db.mv$tag
           |LOCATION '$mvLoc'
           |AS SELECT l_bucket, count(*) AS n, sum(l_quantity) AS s,
           |          min(l_quantity) AS mn
           |FROM $cat.db.mvsrc$tag GROUP BY l_bucket""".stripMargin)
      val mv = TableDefinition(
        TableName("db", s"mv$tag"), mvLoc, PartitionSchema.snapshot, FileFormat.Parquet)
      // a CONSTANT-SIZE delete confined to one bucket of the first
      // replica (min/max present → the re-scan path exercises)
      DeletionVectors.delete(ctx, log, t,
        col("l_bucket") === 0 && col("l_orderkey") < 100000000L,
        user, UpdateMessage("dv"))
      val (incSec, _) = time(MaterializedView.refresh(spark, cat, mv, user))
      val (fullSec, _) = time(MaterializedView.refresh(spark, cat, mv, user, full = true))
      (incSec, fullSec)
    }

    mvRound("w", li) // warm-up: codegen + stage classes, discarded
    val (inc1, full1) = mvRound("b", li)
    val (incN, fullN) = mvRound("s", replicated(scale))
    println(s"""{"metric":"mv_refresh","base":{"incremental":$inc1,"full":$full1},""" +
      s""""scaled_${scale}x":{"incremental":$incN,"full":$fullN}}""")
    guard("mv_incremental_flat",
      incN <= 2.0 * inc1,
      f"scaled incremental $incN%.2fs vs base $inc1%.2fs (flatness bound 2x)")

    // ---------------------------------------------------------- evolution
    def evolveRound(tag: String, rows: DataFrame): Double = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val t = TableDefinition(
        TableName("db", s"evo$tag"),
        Files.createTempDirectory(s"graft_soakevo_$tag").toUri,
        PartitionSchema(List(PartitionColumn("l_returnflag"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      rows.versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
      val (sec, _) = time(PartitionEvolution.evolve(
        spark, ctx, t, PartitionSchema(List(PartitionColumn("l_linestatus"))), user))
      sec
    }

    val evo1 = evolveRound("b", li)
    val evoN = evolveRound("s", replicated(scale))
    println(s"""{"metric":"evolve","base":$evo1,"scaled_${scale}x":$evoN,"scale":$scale}""")
    guard("evolve_linear",
      evoN <= 2.0 * scale * evo1,
      f"scaled $evoN%.2fs vs base $evo1%.2fs at scale $scale (bound 2x scale)")

    // ---------------------------------- metadata-only evolution (r15)
    // claim: the [[PartitionEvolution.evolveMetadataOnly]] boundary is
    // O(metadata) — FLAT in corpus size (the rewrite evolve above is the
    // linear comparison). Context: the era-union read over the mixed fold
    // and the deferred consolidation (linear, the same shuffle as evolve).
    def evolveMetaRound(tag: String, rows: DataFrame): (Double, Double, Double) = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val t = TableDefinition(
        TableName("db", s"evometa$tag"),
        Files.createTempDirectory(s"graft_soakevometa_$tag").toUri,
        PartitionSchema(List(PartitionColumn("l_returnflag"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      rows.versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
      val (boundarySec, evolved) = time(PartitionEvolution.evolveMetadataOnly(
        spark, ctx, t, PartitionSchema(List(PartitionColumn("l_linestatus"))), user))
      // a CONSTANT-SIZE post-boundary batch makes the fold genuinely mixed
      li.where(col("l_quantity") > 49)
        .versionedInsertInto(ctx, evolved, user, UpdateMessage("v2"))
      val (readSec, _) = time(
        DeletionVectors.read(spark, log, evolved)
          .agg(count(lit(1)), sum("l_quantity")).collect())
      val (consolidateSec, _) =
        time(PartitionEvolution.consolidateEras(spark, ctx, evolved, user))
      (boundarySec, readSec, consolidateSec)
    }

    val (mb1, mr1, mc1) = evolveMetaRound("b", li)
    val (mbN, mrN, mcN) = evolveMetaRound("s", replicated(scale))
    println(s"""{"metric":"evolve_metadata_only","base":{"boundary":$mb1,"union_read":$mr1,"consolidate":$mc1},""" +
      s""""scaled_${scale}x":{"boundary":$mbN,"union_read":$mrN,"consolidate":$mcN}}""")
    guard("evolve_metadata_boundary_flat",
      mbN <= 2.0 * mb1,
      f"scaled boundary $mbN%.2fs vs base $mb1%.2fs at scale $scale (flatness bound 2x)")

    // ------------------------------------- merge-on-read DELETE (r16)
    // claim: a row delete scattered across EVERY partition pays one
    // predicate scan plus a pair-sized sidecar write under merge-on-read
    // (`spark.graft.dml.mergeOnRead`), while copy-on-write pays the scan
    // PLUS re-landing every touched partition — a corpus-sized write. At
    // scale both pay the linear scan; only CoW pays the linear write, so
    // MOR must undercut CoW at the scaled corpus.
    // merge-on-read rounds run on FULL-WIDTH lineitem rows: the verbs'
    // scale difference is WRITE volume (copy-on-write re-lands touched
    // partitions wholesale; merge-on-read writes only the changed rows),
    // and narrow 4-column rows would understate the write side every
    // production table pays
    val liWide = graft.queries.Tables.load(spark, base, "lineitem")
    def replicatedWide(n: Int): DataFrame =
      (0 until n).map(k => liWide.withColumn(
        "l_orderkey", col("l_orderkey") + lit(k * 100000000L)))
        .reduce(_ unionByName _)

    def morRound(
        tag: String, rows: DataFrame, mergeOnRead: Boolean)(
        stmt: String => String): Double = {
      val log = new InMemoryTableVersions
      val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
      val cat = s"soakmor$tag"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.spark.GraftTableCatalog].getName)
      graft.spark.GraftTableCatalog.bind(cat, log)
      val t = TableDefinition(
        TableName("db", s"mor$tag"),
        Files.createTempDirectory(s"graft_soakmor_$tag").toUri,
        PartitionSchema(List(PartitionColumn("l_returnflag"))), FileFormat.Parquet)
      ctx.init(t, user, UpdateMessage("init"))
      graft.spark.GraftTableCatalog.register(cat, t)
      rows.versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
      spark.conf.set("spark.graft.dml.mergeOnRead", mergeOnRead.toString)
      try {
        val (sec, _) = time(spark.sql(stmt(s"$cat.db.mor$tag")))
        sec
      } finally spark.conf.unset("spark.graft.dml.mergeOnRead")
    }
    def delStmt(n: String) = s"DELETE FROM $n WHERE l_orderkey % 1009 = 0"
    // scattered single-row-per-key changes across EVERY partition — the
    // copy-on-write killer shape for all three row-level verbs
    def updStmt(n: String) =
      s"UPDATE $n SET l_quantity = l_quantity + 1 WHERE l_orderkey % 1009 = 0"
    def insStmt(n: String) =
      s"INSERT INTO $n SELECT * FROM " +
        s"(SELECT l_orderkey + 900000000 AS l_orderkey, l_partkey, l_suppkey, " +
        s"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, " +
        s"l_linestatus, l_shipdate, l_returnflag FROM $n WHERE l_orderkey % 1009 = 0)"

    morRound("w", liWide, mergeOnRead = true)(delStmt) // warm-up, discarded
    val morBase = morRound("mb", liWide, mergeOnRead = true)(delStmt)
    val cowBase = morRound("cb", liWide, mergeOnRead = false)(delStmt)
    val morN = morRound("ms", replicatedWide(scale), mergeOnRead = true)(delStmt)
    val cowN = morRound("cs", replicatedWide(scale), mergeOnRead = false)(delStmt)
    println(s"""{"metric":"mor_delete","base":{"mor":$morBase,"cow":$cowBase},""" +
      s""""scaled_${scale}x":{"mor":$morN,"cow":$cowN}}""")
    guard("mor_delete_beats_cow_at_scale",
      morN <= cowN,
      f"scaled MOR $morN%.2fs vs CoW $cowN%.2fs at scale $scale " +
        "(CoW re-lands every partition; MOR writes only the pair sidecar)")

    // merge-on-read UPDATE (r16b): CoW re-lands every touched partition;
    // MOR writes the pair sidecar + O(matched) overlay rows. UNLIKE delete
    // and insert, BOTH update paths pay the same full predicate scan (the
    // linear term that dominates at local corpus sizes), so the guard here
    // is PARITY with headroom: MOR must never cost more than 1.25x CoW at
    // scale — its differentiating term (O(matched) writes vs CoW's full
    // re-land, the piece that owns the 100 TB gap) is what the delete and
    // insert guards above measure in isolation, and it only grows in
    // MOR's favor with corpus size.
    val updMorN = morRound("ums", replicatedWide(scale), mergeOnRead = true)(updStmt)
    val updCowN = morRound("ucs", replicatedWide(scale), mergeOnRead = false)(updStmt)
    println(s"""{"metric":"mor_update","scaled_${scale}x":{"mor":$updMorN,"cow":$updCowN}}""")
    guard("mor_update_parity_at_scale",
      updMorN <= 1.25 * updCowN,
      f"scaled MOR $updMorN%.2fs vs CoW $updCowN%.2fs at scale $scale " +
        "(shared full scan dominates locally; parity bound 1.25x — the write-side " +
        "asymmetry is isolated by the delete/insert guards)")

    // merge-on-read INSERT (r16b): CoW's carry re-lands every touched
    // partition's current rows; MOR lands O(batch) overlay rows
    val insMorN = morRound("ims", replicatedWide(scale), mergeOnRead = true)(insStmt)
    val insCowN = morRound("ics", replicatedWide(scale), mergeOnRead = false)(insStmt)
    println(s"""{"metric":"mor_insert","scaled_${scale}x":{"mor":$insMorN,"cow":$insCowN}}""")
    guard("mor_insert_beats_cow_at_scale",
      insMorN <= insCowN,
      f"scaled MOR $insMorN%.2fs vs CoW $insCowN%.2fs at scale $scale " +
        "(CoW carries every touched partition; MOR writes only the batch)")

    // --------------------------------------------- overlay debt / squash
    // claim (r17): without maintenance every merge-on-read append adds a
    // read-side union leg + existence probe; auto-squash bounds the debt
    // so a read after N appends costs ~ a read after a full squash, not
    // N union legs. Three tables, same content: debt (N raw appends),
    // auto (sink wiring: autoSquash after each append), squashed (debt
    // then one manual squash).
    locally {
      val nAppends = 48
      def overlayRound(tag: String, maintained: Boolean): (Double, TableDefinition, VersionContext) = {
        val log = new InMemoryTableVersions
        val ctx = VersionContext(VersionedMetastore(log, new InMemoryMetastore))
        val t = TableDefinition(
          TableName("db", s"ovdebt$tag"),
          Files.createTempDirectory(s"graft_soakov_$tag").toUri,
          PartitionSchema(List(PartitionColumn("l_returnflag"))), FileFormat.Parquet)
        ctx.init(t, user, UpdateMessage("init"))
        li.limit(0).unionByName(li.where(col("l_orderkey") % 7 === 0))
          .versionedInsertInto(ctx, t, user, UpdateMessage("v1"))
        val batch = li.where(col("l_orderkey") % 997 === 0).cache()
        batch.count()
        (1 to nAppends).foreach { k =>
          graft.spark.RowOverlay.append(
            batch.withColumn("l_orderkey", col("l_orderkey") + lit(k * 100000000L)),
            ctx, t, user, UpdateMessage(s"append $k"))
          if (maintained) {
            graft.spark.RowOverlay.autoSquash(spark, ctx, t, user, maxDirs = 8)
            ()
          }
        }
        batch.unpersist()
        val (sec, _) = time(
          graft.spark.DeletionVectors.read(spark, log, t)
            .groupBy("l_returnflag")
            .agg(org.apache.spark.sql.functions.sum("l_quantity")).collect())
        (sec, t, ctx)
      }
      val (debtSec, debtT, debtCtx) = overlayRound("raw", maintained = false)
      val (autoSec, autoT, _) = overlayRound("auto", maintained = true)
      // one manual squash over the debt table = the O(1)-dirs floor
      graft.spark.RowOverlay.squash(
        spark, debtCtx, debtT, user, UpdateMessage("squash"))
      val (squashedSec, _) = time(
        graft.spark.DeletionVectors.read(
          spark, debtCtx.metastore.tableVersions, debtT)
          .groupBy("l_returnflag")
          .agg(org.apache.spark.sql.functions.sum("l_quantity")).collect())
      val _ = autoT
      println(s"""{"metric":"overlay_debt","appends":$nAppends,""" +
        s""""read_debt":$debtSec,"read_auto":$autoSec,"read_squashed":$squashedSec}""")
      guard("auto_squash_bounds_read_debt",
        autoSec <= math.max(1.5 * squashedSec, squashedSec + 0.5),
        f"auto-maintained read $autoSec%.2fs vs squashed floor $squashedSec%.2fs " +
          f"(raw $nAppends-append debt read: $debtSec%.2fs)")
    }

    println(s"""{"summary":"soak-maintenance","scale":$scale,""" +
      s""""failed":[${failed.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
