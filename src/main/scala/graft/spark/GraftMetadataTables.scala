package graft.spark

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.core._
import graft.core.TableVersions.CommitId

/**
 * Metadata inspection TVFs — the Iceberg `table$partitions` / `table$files`
 * idiom as SQL table functions (Delta's `DESCRIBE DETAIL` ground):
 *
 * {{{
 *   SELECT * FROM graft_partitions('graft.db.t')              -- current state
 *   SELECT * FROM graft_partitions('graft.db.t', '<ref|id>')  -- any state
 *   SELECT * FROM graft_files('graft.db.t' [, '<ref|id>'])
 * }}}
 *
 * `graft_partitions` returns `(partition, version)` straight from the
 * commit-log fold — pure metadata, zero filesystem access, O(#partitions).
 * `graft_files` adds the physical inventory: one row per data file of each
 * referenced version dir `(partition, file, size_bytes)` — O(#files)
 * driver-side listing, the same bound Spark's FileIndex pays for any scan,
 * and the ops ground truth for "what exactly would this state read".
 * Version args resolve ref names first, then raw commit ids (the standard
 * read contract), so `graft_files('t', 'my-tag')` audits a tagged state.
 *
 * Both compose as ordinary relations (joins, aggregates, filters), so the
 * ops questions — file-count skew per partition, small-file pressure
 * before OPTIMIZE, bytes per partition — are one SQL query each.
 */
object GraftMetadataTables {

  val partitionsFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_partitions"),
    new ExpressionInfo(GraftMetadataTables.getClass.getName, "graft_partitions"),
    (args: Seq[Expression]) => buildPartitions(args))

  val filesFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_files"),
    new ExpressionInfo(GraftMetadataTables.getClass.getName, "graft_files"),
    (args: Seq[Expression]) => buildFiles(args))

  /** The snapshot-table rendering in the `partition` column. */
  val SnapshotPartition = "<snapshot>"

  private val partitionsSchema = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("version", StringType, nullable = false)))

  private val filesSchema = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  private def resolveState(
      args: Seq[Expression],
      fn: String): (SparkSession, TableDefinition, TableVersion) = {
    val (spark, defn, state, _, _) = resolveStateFull(args, fn)
    (spark, defn, state)
  }

  private def resolveStateFull(
      args: Seq[Expression],
      fn: String): (SparkSession, TableDefinition, TableVersion,
        GraftTableCatalog.Binding, Option[CommitId]) = {
    val (tableName, asOf) = args match {
      case Seq(Literal(t, StringType)) => (String.valueOf(t), None)
      case Seq(Literal(t, StringType), Literal(v, StringType)) =>
        (String.valueOf(t), Some(String.valueOf(v)))
      case other =>
        sys.error(s"$fn takes ('catalog.db.table'[, 'ref-or-commit-id']), got " +
          other.map(_.sql).mkString(", "))
    }
    val spark = SparkSession.active
    val (binding, defn) =
      GraftMaintenanceSql.resolve(spark, tableName.split("\\.").toSeq)
    val at: Option[CommitId] = asOf.map { target =>
      binding.log.refs(defn.name).get(target).map(_.id).getOrElse(CommitId(target))
    }
    val state = at match {
      case None     => binding.log.currentVersion(defn.name)
      case Some(id) => binding.log.versionAt(defn.name, id)
    }
    (spark, defn, state, binding, at)
  }

  /** `(partition path, version label, physical dir)` per referenced dir. */
  private def referencedDirs(
      defn: TableDefinition, state: TableVersion): List[(String, String, String)] =
    state match {
      case SnapshotTableVersion(v) =>
        if (v == Version.Unversioned) Nil
        else List((SnapshotPartition, v.label,
          Partition.normalizedDir(defn.location).toString + v.label))
      case PartitionedTableVersion(pvs) =>
        pvs.toList.map { case (p, v) =>
          (p.hivePath, v.label, SparkPaths.dirFor(defn.location, p, v))
        }
    }

  private def buildPartitions(args: Seq[Expression]): LogicalPlan = {
    val (spark, defn, state) = resolveState(args, "graft_partitions")
    val rows = referencedDirs(defn, state).map { case (p, v, _) => Row(p, v) }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), partitionsSchema).queryExecution.analyzed
  }

  private def buildFiles(args: Seq[Expression]): LogicalPlan = {
    val (spark, defn, state, binding, at) = resolveStateFull(args, "graft_files")
    // live merge-on-read overlay leaves ([[RowOverlay]]) are state files
    // too — a storage audit that missed them would undercount
    val overlayLeaves = RowOverlay.contributions(spark, binding.log, defn, at)
      .flatMap(c => c.leaves.map {
        case (Some(p), path) => (p.hivePath, path)
        case (None, path)    => (SnapshotPartition, path)
      })
    val dirs = referencedDirs(defn, state).map { case (p, _, dir) => (p, dir) } ++
      overlayLeaves
    if (dirs.isEmpty)
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](), filesSchema).queryExecution.analyzed
    // the inventory is O(#files) ROWS but never O(#files) DRIVER work: one
    // Spark job lists the referenced dirs in parallel, and the rows stay
    // distributed until the consumer's own plan decides what to do with
    // them (a count/sum aggregates executor-side; only a bare SELECT *
    // collects them all)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val slices = math.max(1, math.min(dirs.size, spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(dirs, slices).flatMap { case (p, dir) =>
      val path = new org.apache.hadoop.fs.Path(dir)
      val fs = path.getFileSystem(conf.value)
      if (!fs.exists(path)) Nil
      else fs.listStatus(path).toList
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
          && !st.getPath.getName.startsWith("."))
        .map(st => Row(p, st.getPath.toString, st.getLen))
    }
    spark.createDataFrame(rows, filesSchema).queryExecution.analyzed
  }
}
