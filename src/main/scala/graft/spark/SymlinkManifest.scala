package graft.spark

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

import graft.core._

/**
 * `GENERATE symlink_format_manifest FOR TABLE t` — the Delta parity
 * surface for EXTERNAL engines: writes
 * `<table>/_symlink_format_manifest/[<k=v dirs>/]manifest` text files,
 * each line the absolute URI of one CURRENT-version data file, so Hive
 * connectors (Presto / Trino / Athena `SymlinkTextInputFormat`) read
 * exactly the committed state without understanding the commit log or
 * the versioned dir layout. Stale version dirs — physically present for
 * time travel — are exactly what the manifest EXCLUDES; that is its
 * point.
 *
 * Refusals (Delta refuses generate for DV tables identically): live
 * deletion vectors, live overlay rows, or a mixed era fold cannot be
 * expressed as a plain file list — serving the raw files would
 * resurrect hidden rows / drop overlay rows / double-serve eras. Run
 * `OPTIMIZE` / `ALTER TABLE … SQUASH SIDECARS` / `… CONSOLIDATE
 * PARTITION ERAS` first; the error names the remedy.
 *
 * The manifest is DERIVED, REGENERABLE metadata (never load-bearing for
 * graft's own reads): generation stages fresh files then swaps the dir;
 * a crash mid-generate is cured by re-running. Scale shape: pure
 * driver-side metadata — O(#partitions) dir listings, no data read, no
 * Spark job.
 */
object SymlinkManifest {

  val DirName = "_symlink_format_manifest"

  /** One manifest entry: partition (empty string for snapshot tables) →
    * number of data files listed. */
  def generate(
      spark: SparkSession,
      log: TableVersions,
      table: TableDefinition): Seq[(String, Int)] = {
    require(!DeletionVectors.hasVectors(spark, log, table, None),
      s"GENERATE symlink_format_manifest: ${table.name.fullyQualifiedName} has " +
        "live deletion vectors — a file-list manifest would resurrect deleted " +
        "rows. Run OPTIMIZE (or ALTER TABLE ... SQUASH SIDECARS) first")
    require(!RowOverlay.hasOverlay(spark, log, table, None),
      s"GENERATE symlink_format_manifest: ${table.name.fullyQualifiedName} has " +
        "live merge-on-read overlay rows — a file-list manifest would drop " +
        "them. Run OPTIMIZE (or ALTER TABLE ... SQUASH SIDECARS) first")
    // a live column mapping means the files carry PHYSICAL column names
    // the logical schema has renamed away — an external reader of the raw
    // files would see the stale names (Delta refuses generate for
    // column-mapping tables for exactly this reason)
    require(!ColumnMapping.hasMapping(spark, log, table, None),
      s"GENERATE symlink_format_manifest: ${table.name.fullyQualifiedName} has " +
        "a column mapping (renamed/dropped/widened columns) — the data files " +
        "carry frozen PHYSICAL column names, which is what a raw external " +
        "reader would see. A file-list manifest cannot express the mapping " +
        "(the Delta posture: column-mapping tables refuse generate)")
    val fold = log.currentVersion(table.name)
    require(PartitionEvolution.eraSignatures(fold).size <= 1,
      s"GENERATE symlink_format_manifest: ${table.name.fullyQualifiedName} has " +
        "a mixed partition-scheme fold — run ALTER TABLE ... CONSOLIDATE " +
        "PARTITION ERAS first")
    val conf = spark.sessionState.newHadoopConf()
    val baseDir = Partition.normalizedDir(table.location).toString
    val fs = FileSystem.get(new URI(baseDir), conf)
    val manifestRoot = new HPath(baseDir + DirName)
    val staged = new HPath(baseDir + DirName + ".staged")
    fs.delete(staged, true)

    def dataFiles(dir: String): Seq[String] = {
      val p = new HPath(dir)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq
        .filter(st => st.isFile && {
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        })
        .map(st => fs.makeQualified(st.getPath).toString)
        .sorted
    }
    def write(rel: String, files: Seq[String]): Unit = {
      val target = if (rel.isEmpty) new HPath(staged, "manifest")
        else new HPath(new HPath(staged, rel), "manifest")
      val out = fs.create(target, true)
      try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }

    val entries: Seq[(String, Int)] = fold match {
      case SnapshotTableVersion(v) =>
        require(v != Version.Unversioned,
          s"table ${table.name.fullyQualifiedName} has no data to manifest")
        val files = dataFiles(VersionPaths.pathFor(table.location, v).toString)
        write("", files)
        Seq("" -> files.size)
      case PartitionedTableVersion(pvs) =>
        require(pvs.nonEmpty,
          s"table ${table.name.fullyQualifiedName} has no data to manifest")
        pvs.toSeq.sortBy(_._1.hivePath).map { case (p, v) =>
          val rel = SparkPaths.escapedPartitionPath(p)
          val files = dataFiles(SparkPaths.dirFor(table.location, p, v))
          write(rel, files)
          p.hivePath -> files.size
        }
    }
    // swap: the manifest is regenerable metadata — delete + rename is
    // fine (a crash between the two re-runs generate; graft reads never
    // consult it)
    fs.delete(manifestRoot, true)
    require(fs.rename(staged, manifestRoot),
      s"failed to publish $manifestRoot")
    entries
  }
}
