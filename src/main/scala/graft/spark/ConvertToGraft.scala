package graft.spark

import java.nio.charset.StandardCharsets
import java.time.Instant

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.util.SerializableConfiguration

import graft.core._
import graft.core.TableVersions.{TableOperation, TableUpdate, UpdateMessage, UserId}

/**
 * CONVERT TO GRAFT — in-place adoption of a pre-existing plain parquet/ORC
 * directory (optionally Hive-partitioned) as a versioned table, without
 * rewriting a byte of data. The migration path Delta spells
 * `CONVERT TO DELTA parquet.`/path``, re-expressed on the version-dir
 * model (reference `core/.../VersionPaths.scala:15-51` reserves the
 * `Unversioned` sentinel for exactly this pre-existing-data case).
 *
 * The sentinel cannot be the END state, though: `Unversioned` maps to the
 * BARE directory, which also holds the version subdirs once any write
 * happens, so a bare-file state would union every later version into its
 * scan ([[VersionedReader]]'s documented refusal). CONVERT therefore mints
 * ONE fresh version label and RENAMES each data file into
 * `<its dir>/<label>/` — a pure filesystem-metadata move (no byte copy on
 * any hierarchical store), O(#files) rename calls, distributed as a Spark
 * job above `spark.graft.convert.distributedMinFiles`. One commit then
 * registers every discovered partition at that label (one
 * `AddTableVersion` for snapshot tables), and every downstream feature —
 * time travel, vacuum, DV/merge-on-read, stats sidecars, compaction —
 * works on the adopted table unchanged.
 *
 * Crash safety: a `_convert.marker` JSON (the chosen label + the declared
 * layout) is written BEFORE any move. Re-running CONVERT resumes it: files
 * already inside the label dir stay, remaining loose files move, the
 * commit fills in whatever the log is missing, and the marker deletes
 * last. Without a marker, a location already containing version-label
 * dirs — or a table name already tracked in the commit log — refuses:
 * both mean "this is already a graft table". The directory must be
 * quiescent (no concurrent external writer) for the duration.
 */
object ConvertToGraft {

  /** Marker file recording an in-flight conversion (resume token). */
  val MarkerName = "_convert.marker"

  private val mapper = new ObjectMapper()

  /** One leaf data directory: its escaped path relative to the table
    * location (empty for a snapshot table's root), the loose data files
    * still to move, and whether the convert label's dir already exists
    * (a resumed conversion's earlier progress). */
  private final case class Leaf(rel: String, loose: List[String], hasLabelDir: Boolean)

  /** DRY RUN report: what a conversion WOULD adopt (after the full
    * pre-flight — discovery, layout + partition-value validation, format
    * sniff), with nothing written, moved, or committed. */
  final case class Preview(partitions: Int, files: Long)

  /** The validated pre-flight state shared by [[preview]] and [[convert]]:
    * everything that can refuse has refused BEFORE this exists, with the
    * directory untouched. */
  private final case class Plan(
      version: Version, resumed: Boolean, leaves: List[Leaf],
      fs: FileSystem, root: HPath, markerPath: HPath)

  /** Discovery + validation with ZERO writes: the marker is not created,
    * no file moves. Refuses everything [[convert]] would refuse —
    * unadoptable layouts (foreign subdirs, files at partition depth,
    * wrong `k=v` columns), null/empty partition values, a mis-declared
    * FORMAT (one data file's magic bytes are sniffed), an
    * already-tracked table. Validating BEFORE the move phase is what
    * keeps a bad layout refusal non-destructive: a plain dir with a
    * `__HIVE_DEFAULT_PARTITION__` subdir (a stock-Spark artifact) or a
    * parquet dir declared FORMAT orc refuses with every file in place. */
  private def plan(
      spark: SparkSession,
      ctx: VersionContext,
      table: TableDefinition): Plan = {
    val log = ctx.metastore.tableVersions
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(table.location, conf)
    val root = new HPath(table.location)
    require(fs.exists(root) && fs.getFileStatus(root).isDirectory,
      s"CONVERT TO GRAFT: ${table.location} does not exist or is not a directory")

    val markerPath = new HPath(root, MarkerName)
    val resumed = readMarker(fs, markerPath, table)
    if (resumed.isEmpty && tracked(log, table.name))
      sys.error(
        s"CONVERT TO GRAFT: ${table.name.fullyQualifiedName} is already tracked " +
          "in the commit log (and no conversion is in flight) — it is already a graft table")
    val version = resumed.getOrElse(Version.generateVersion())

    val nCols = table.partitionSchema.columns.size
    val leaves = discover(spark, conf, root.toString, table, version, nCols)

    // partition values must parse into the versioned model BEFORE anything
    // moves — null/empty sentinel dirs make the layout unadoptable, and
    // discovering that mid-conversion would strand a half-moved tree
    leaves.filter(l => l.loose.nonEmpty || l.hasLabelDir)
      .foreach(l => if (l.rel.nonEmpty) { parsePartition(l.rel, table.partitionSchema); () })

    // FORMAT pre-flight: sniff one data file's magic bytes — a
    // mis-declared FORMAT must refuse NOW, not at first read after every
    // file was renamed (only parquet/ORC carry a magic header; other
    // declared formats skip the check)
    if (table.format.name == "parquet" || table.format.name == "orc") leaves.iterator
      .flatMap(l => l.loose.headOption.map(n =>
        if (l.rel.isEmpty) new HPath(root, n) else new HPath(new HPath(root, l.rel), n)))
      .take(1)
      .foreach { sample =>
        sniffFormat(fs, sample).foreach { detected =>
          require(detected == table.format.name,
            s"CONVERT TO GRAFT: declared FORMAT ${table.format.name} but $sample " +
              s"is a $detected file — fix the FORMAT declaration (no file was moved)")
        }
      }
    Plan(version, resumed.isDefined, leaves, fs, root, markerPath)
  }

  /** `CONVERT TO GRAFT … DRY RUN`: the full pre-flight (so a doomed
    * conversion refuses here with the same errors), then the discovered
    * partition/file counts — nothing written ([[Vacuum]]'s DRY RUN
    * posture). */
  def preview(
      spark: SparkSession,
      ctx: VersionContext,
      table: TableDefinition): Preview = {
    val p = plan(spark, ctx, table)
    val bearing = p.leaves.filter(l => l.loose.nonEmpty || l.hasLabelDir)
    Preview(
      partitions = if (table.isSnapshot) math.min(bearing.size, 1) else bearing.size,
      files = p.leaves.map(_.loose.size.toLong).sum)
  }

  /** Adopt the plain directory at `table.location` as versioned table
    * `table.name`. Returns the number of data files adopted this run;
    * afterwards the table reads/writes like any other versioned table. */
  def convert(
      spark: SparkSession,
      ctx: VersionContext,
      table: TableDefinition,
      user: UserId): Long = {
    val log = ctx.metastore.tableVersions
    val conf = spark.sessionState.newHadoopConf()
    val Plan(version, resumed, leaves, fs, root, markerPath) = plan(spark, ctx, table)
    if (!resumed) writeMarker(fs, markerPath, table, version)

    // move phase: every loose file renames into its dir's label subdir —
    // distributed when the file count is large (renames are independent
    // FS-metadata calls; the job shape is the Vacuum/Compaction listing
    // precedent). mkdirs is idempotent and runs inside the task so a
    // 10^6-partition convert never serializes on driver round-trips.
    val moves = leaves.flatMap(l => l.loose.map(f => (l.rel, f)))
    if (moves.nonEmpty) {
      val rootStr = root.toString
      val label = version.label
      val minDist = spark.conf.getOption(
        "spark.graft.convert.distributedMinFiles").map(_.toInt).getOrElse(4096)
      def moveOne(dfs: FileSystem, rel: String, name: String): Unit = {
        val dir = if (rel.isEmpty) new HPath(rootStr) else new HPath(rootStr, rel)
        val dest = new HPath(new HPath(dir, label), name)
        dfs.mkdirs(dest.getParent)
        val src = new HPath(dir, name)
        if (!dfs.rename(src, dest) && !(dfs.exists(dest) && !dfs.exists(src)))
          sys.error(s"CONVERT TO GRAFT: failed to move $src to $dest")
      }
      if (moves.size >= minDist) {
        val sconf = new SerializableConfiguration(conf)
        val slices = math.max(1,
          math.min(moves.size, spark.sparkContext.defaultParallelism))
        spark.sparkContext.parallelize(moves, slices).foreachPartition { it =>
          var dfs: FileSystem = null
          it.foreach { case (rel, name) =>
            if (dfs == null)
              dfs = new HPath(rootStr).getFileSystem(sconf.value)
            moveOne(dfs, rel, name)
          }
        }
      } else moves.foreach { case (rel, name) => moveOne(fs, rel, name) }
    }

    // commit phase: init (idempotent), then ONE commit registering every
    // discovered leaf at the convert label — minus whatever a resumed
    // conversion's earlier commit already holds
    ctx.init(table, user, UpdateMessage(
      s"CONVERT TO GRAFT ${table.name.fullyQualifiedName} at ${table.location}"))
    val ops: List[TableOperation] =
      if (table.isSnapshot) {
        val hasData = leaves.exists(l => l.loose.nonEmpty || l.hasLabelDir)
        val already = tracked(log, table.name) && (log.currentVersion(table.name) match {
          case SnapshotTableVersion(v) => v == version
          case _                       => false
        })
        if (hasData && !already) List(TableOperation.AddTableVersion(version)) else Nil
      } else {
        val current: Map[Partition, Version] = log.currentVersion(table.name) match {
          case PartitionedTableVersion(pvs) => pvs
          case _                            => Map.empty
        }
        leaves
          .filter(l => l.loose.nonEmpty || l.hasLabelDir)
          .map(l => parsePartition(l.rel, table.partitionSchema))
          .filterNot(p => current.get(p).contains(version))
          .map(TableOperation.AddPartitionVersion(_, version))
      }
    if (ops.nonEmpty) {
      ctx.metastore.commit(table.name, TableUpdate(
        user,
        UpdateMessage(s"convert: adopt ${ops.size} pre-existing " +
          (if (table.isSnapshot) "snapshot state" else "partition(s)") +
          s" at label ${version.label}"),
        Instant.now(), ops))
      ()
    }
    fs.delete(markerPath, false)
    moves.size.toLong
  }

  // ---- discovery -------------------------------------------------------

  /** Walk the partition-dir tree level by level (one Spark job per level
    * when a frontier is large — the [[Vacuum]] distributed-listing shape).
    * Non-leaf levels must contain exactly `k=v` dirs for the declared
    * column of that depth; leaf levels contain loose data files and (on
    * resume) the convert label's own dir. Anything else — version-label
    * dirs from a previous life, foreign subdirs, files at partition
    * depth — refuses loudly: an unknown layout must never be adopted
    * half-understood. */
  private def discover(
      spark: SparkSession,
      conf: org.apache.hadoop.conf.Configuration,
      rootStr: String,
      table: TableDefinition,
      version: Version,
      nCols: Int): List[Leaf] = {
    val schemaCols = table.partitionSchema.columns.map(_.name)
    val label = version.label
    val minDist = spark.conf.getOption(
      "spark.graft.convert.distributedMinDirs").map(_.toInt).getOrElse(1024)

    // per-directory scan: Left(leaf) at partition depth, Right(child rel)
    // below it. Pure given an FS handle, so it runs on driver or executor.
    def scanDir(dfs: FileSystem, rel: String, depth: Int): List[Either[Leaf, String]] = {
      val dir = if (rel.isEmpty) new HPath(rootStr) else new HPath(rootStr, rel)
      val entries = dfs.listStatus(dir).toList
        .filterNot(st => st.getPath.getName.startsWith("_") ||
          st.getPath.getName.startsWith("."))
      if (depth == nCols) {
        var hasLabel = false
        val loose = List.newBuilder[String]
        entries.foreach { st =>
          val name = st.getPath.getName
          if (st.isDirectory) {
            if (name == label) hasLabel = true
            else Version.parse(name) match {
              case Right(_) => sys.error(
                s"CONVERT TO GRAFT: $dir already contains version dir '$name' — " +
                  "this location belongs to an existing graft table")
              case Left(_) => sys.error(
                s"CONVERT TO GRAFT: unexpected subdirectory '$name' under $dir — " +
                  "the layout must be plain Hive partition dirs over data files")
            }
          } else loose += name
        }
        List(Left(Leaf(rel, loose.result(), hasLabel)))
      } else {
        val expected = GraftSqlShim.escapePathName(schemaCols(depth))
        entries.map { st =>
          val name = st.getPath.getName
          if (!st.isDirectory)
            sys.error(
              s"CONVERT TO GRAFT: unexpected file '$name' at partition depth $depth " +
                s"under $dir — expected only ${schemaCols(depth)}=<value> dirs")
          val eq = name.indexOf('=')
          if (eq <= 0 || name.substring(0, eq) != expected)
            sys.error(
              s"CONVERT TO GRAFT: dir '$name' under $dir does not match declared " +
                s"partition column ${schemaCols(depth)}")
          Right(if (rel.isEmpty) name else s"$rel/$name")
        }
      }
    }

    val out = List.newBuilder[Leaf]
    var frontier: List[String] = List("")
    var depth = 0
    while (frontier.nonEmpty) {
      val batch: List[Either[Leaf, String]] =
        if (frontier.size >= minDist) {
          val sconf = new SerializableConfiguration(conf)
          val d = depth
          val slices = math.max(1,
            math.min(frontier.size, spark.sparkContext.defaultParallelism))
          spark.sparkContext.parallelize(frontier, slices).flatMap { rel =>
            val dfs = new HPath(rootStr).getFileSystem(sconf.value)
            scanDir(dfs, rel, d)
          }.collect().toList
        } else {
          val dfs = new HPath(rootStr).getFileSystem(conf)
          frontier.flatMap(rel => scanDir(dfs, rel, depth))
        }
      out ++= batch.collect { case Left(l) => l }
      frontier = batch.collect { case Right(r) => r }
      depth += 1
    }
    out.result()
  }

  /** Unescape an escaped `k=v[/k2=v2]` relative path back into the model's
    * Partition, against the declared schema (order already validated by
    * the walk). The null sentinel refuses — the versioned layout has no
    * null partitions (same contract as the write path). */
  private def parsePartition(rel: String, schema: PartitionSchema): Partition =
    Partition(rel.split("/").toList.zip(schema.columns).map { case (seg, col) =>
      val value = GraftSqlShim.unescapePathName(seg.substring(seg.indexOf('=') + 1))
      if (value == "__HIVE_DEFAULT_PARTITION__" || value.isEmpty)
        throw new IllegalArgumentException(
          s"partition column ${col.name} contains null or empty values; " +
            "they are not supported by the versioned layout")
      ColumnValue(col, value)
    })

  /** Magic-byte sniff of one data file's header: "parquet" (`PAR1`),
    * "orc" (`ORC`), or "unrecognized" — parquet and ORC both stamp their
    * magic at offset 0, so one 4-byte read settles the declared FORMAT
    * before any rename. */
  private def sniffFormat(fs: FileSystem, file: HPath): Option[String] = {
    if (fs.getFileStatus(file).getLen < 4) return Some("unrecognized (too short)")
    val in = fs.open(file)
    try {
      val buf = new Array[Byte](4)
      in.readFully(0L, buf, 0, 4)
      if (buf(0) == 'P' && buf(1) == 'A' && buf(2) == 'R' && buf(3) == '1')
        Some("parquet")
      else if (buf(0) == 'O' && buf(1) == 'R' && buf(2) == 'C') Some("orc")
      else Some("unrecognized")
    } finally in.close()
  }

  // ---- marker ----------------------------------------------------------

  private def tracked(log: TableVersions, name: TableName): Boolean =
    try { log.currentCommit(name); true }
    catch { case _: NoSuchElementException => false }

  private def writeMarker(
      fs: FileSystem, path: HPath, table: TableDefinition, version: Version): Unit = {
    val node = mapper.createObjectNode()
    node.put("label", version.label)
    node.put("table", table.name.fullyQualifiedName)
    node.put("format", table.format.name)
    val cols = node.putArray("partitionColumns")
    table.partitionSchema.columns.foreach(c => cols.add(c.name))
    val out = fs.create(path, false) // create-exclusive: two converts refuse
    try out.write(mapper.writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a resume marker if present, validating that the declared layout
    * matches the in-flight conversion's — a convert resumed with different
    * partition columns would mis-parse every leaf. */
  private def readMarker(
      fs: FileSystem, path: HPath, table: TableDefinition): Option[Version] =
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      val text =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
          buf.toString("UTF-8")
        } finally in.close()
      val node = mapper.readTree(text)
      val cols = (0 until node.get("partitionColumns").size())
        .map(node.get("partitionColumns").get(_).asText()).toList
      require(cols == table.partitionSchema.columns.map(_.name),
        s"CONVERT TO GRAFT: in-flight conversion at $path declares partition " +
          s"columns $cols but the caller declared " +
          s"${table.partitionSchema.columns.map(_.name)} — finish the original " +
          "conversion with its own layout")
      require(node.get("table").asText() == table.name.fullyQualifiedName,
        s"CONVERT TO GRAFT: in-flight conversion at $path belongs to table " +
          s"${node.get("table").asText()}, not ${table.name.fullyQualifiedName}")
      Some(Version.parse(node.get("label").asText()).fold(
        e => sys.error(s"CONVERT TO GRAFT: corrupt marker at $path: $e"), identity))
    }
}
