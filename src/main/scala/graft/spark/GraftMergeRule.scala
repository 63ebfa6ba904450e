package graft.spark

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.core.TableDefinition
import graft.core.TableVersions.{UpdateMessage, UserId}

/**
 * SQL `MERGE INTO` for graft catalog tables — the statement a Delta/Iceberg
 * user writes becomes the engine's partition-granular copy-on-write
 * [[Merge.mergeInto]]:
 *
 * {{{
 *   MERGE INTO graft.db.t t USING src s ON t.k = s.k
 *   WHEN MATCHED THEN UPDATE SET *
 *   WHEN NOT MATCHED THEN INSERT *
 * }}}
 *
 * Spark's own row-level MERGE planning requires `SupportsRowLevelOperations`
 * (a full V2 delta-write surface); this engine's commit granularity is the
 * partition, so the honest mapping is the canonical upsert form above,
 * intercepted AFTER analysis has resolved and aligned the assignments and
 * BEFORE the planner's row-level-operation check would reject the table.
 * Supported shape: equi-condition over same-named columns, one
 * `WHEN MATCHED THEN UPDATE SET *`, one `WHEN NOT MATCHED THEN INSERT *`
 * (exactly the semantics [[Merge.mergeInto]] implements); anything else —
 * conditional clauses, DELETE actions, column-level assignments,
 * `NOT MATCHED BY SOURCE` — rejects with a clear error rather than silently
 * approximating.
 *
 * Registered by `graft.plans.GraftExtensions` (post-hoc resolution rule).
 */
final case class GraftMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if m.resolved =>
      graftRelation(m.targetTable) match {
        case None => m
        case Some(rel) =>
          val table = rel.table.asInstanceOf[GraftV2Table]
          validateActions(m)
          val keys = equiKeys(m.mergeCondition, m.targetTable, m.sourceTable)
          GraftMergeCommand(
            table.tableDefinition, table.tableBinding,
            m.sourceTable, keys, rel.schema)
      }
  }

  private def graftRelation(target: LogicalPlan): Option[DataSourceV2Relation] =
    target.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftV2Table] => r
    }

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE INTO supports 'ON <same-named equi-keys> WHEN MATCHED THEN UPDATE SET * " +
        s"WHEN NOT MATCHED THEN INSERT *' only; unsupported: $what")

  /** The condition must be a conjunction of `target.k = source.k` equalities
    * over same-named columns — those names are the merge keys. */
  private def equiKeys(
      cond: Expression, target: LogicalPlan, source: LogicalPlan): Seq[String] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    conjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val (t, s) =
          if (target.outputSet.contains(a) && source.outputSet.contains(b)) (a, b)
          else if (target.outputSet.contains(b) && source.outputSet.contains(a)) (b, a)
          else unsupported(s"condition side not a plain target/source column: $a = $b")
        if (!t.name.equalsIgnoreCase(s.name))
          unsupported(s"key columns must share a name, got ${t.name} = ${s.name}")
        t.name
      case other => unsupported(s"non-equi condition clause: ${other.sql}")
    }
  }

  /** Accept exactly the analyzer's expansion of `UPDATE SET *` / `INSERT *`:
    * every assignment target is a column assigned from the same-named source
    * column (possibly cast). */
  private def validateActions(m: MergeIntoTable): Unit = {
    def rootAttr(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case c: Cast               => rootAttr(c.child)
      case _                     => None
    }
    def starShaped(assigns: Seq[Assignment]): Boolean =
      assigns.forall { a =>
        (rootAttr(a.key), rootAttr(a.value)) match {
          case (Some(k), Some(v)) => k.name.equalsIgnoreCase(v.name)
          case _                  => false
        }
      }
    m.matchedActions match {
      case Seq(UpdateAction(None, assigns, _)) if starShaped(assigns) => ()
      case other => unsupported(s"matched actions ${describe(other)}")
    }
    m.notMatchedActions match {
      case Seq(InsertAction(None, assigns)) if starShaped(assigns) => ()
      case other => unsupported(s"not-matched actions ${describe(other)}")
    }
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE")
  }

  private def describe(actions: Seq[MergeAction]): String =
    if (actions.isEmpty) "(none)" else actions.map(_.getClass.getSimpleName).mkString(", ")
}

/** Driver-side execution of the intercepted MERGE: materialize the source,
  * align it to the table's columns, and run the partition-granular
  * copy-on-write upsert. One ordinary commit — time travel shows the
  * pre-merge state. */
final case class GraftMergeCommand(
    defn: TableDefinition,
    binding: GraftTableCatalog.Binding,
    source: LogicalPlan,
    keys: Seq[String],
    relationSchema: StructType) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.GraftSqlShim.ofRows(session, source)
    // align to the WRITE-side schema: the versioned reader's view of the
    // current contents when the table holds data (partition columns stay
    // strings there), else the relation's column order as declared
    val reader = VersionedReader(session, binding.log)
    val current = reader.read(defn)
    val aligned =
      if (current.columns.nonEmpty)
        src.select(current.schema.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
      else
        src.select(relationSchema.map(f => col(f.name).as(f.name)): _*)
    val ctx = VersionContext(GraftV2Table.metastoreFor(binding, defn))
    Merge.mergeInto(
      ctx, binding.log, defn, aligned, keys, UserId("sql"), UpdateMessage("MERGE (SQL)"))
    Seq.empty
  }
}
