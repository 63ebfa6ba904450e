package graft.spark

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, Cast, CreateNamedStruct, EqualTo, Expression, In, InSubquery,
  ListQuery, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment, DeleteAction, DeleteFromTable, Filter, InsertAction, LogicalPlan, MergeAction,
  MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{broadcast, col, when}
import org.apache.spark.sql.types.StructType

import graft.core.TableDefinition
import graft.core.TableVersions.{UpdateMessage, UserId}

/**
 * SQL row-level DML for graft catalog tables — `MERGE INTO`, `UPDATE`, and
 * row-level `DELETE` become partition-granular COPY-ON-WRITE rewrites
 * through the ordinary versioned write path (one time-travelable commit
 * each), the way Delta/Iceberg users expect to drive a versioned table:
 *
 * {{{
 *   MERGE INTO graft.db.t t USING src s ON t.k = s.k
 *   WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
 *
 *   UPDATE graft.db.t SET label = 'x' WHERE id > 5
 *   DELETE FROM graft.db.t WHERE id > 5       -- row-level predicate
 * }}}
 *
 * Spark's own row-level planning requires `SupportsRowLevelOperations` (a
 * full V2 delta-write surface); this engine's commit granularity is the
 * partition, so the statements are intercepted AFTER analysis has resolved
 * them and BEFORE the planner's row-level-operation check would reject the
 * table, then executed copy-on-write: only partitions holding affected rows
 * are read and rewritten — every other partition's version pointer stays
 * put. A `DELETE` whose predicate is decidable from partition VALUES alone
 * is deliberately NOT intercepted: it keeps flowing to the metadata-only
 * `SupportsDelete` path (a `RemovePartition` commit, no data rewrite).
 *
 * Honest limits (reject with a clear error, never approximate): MERGE
 * supports the canonical `UPDATE SET * / INSERT *` form with same-named
 * equi-keys; UPDATE may not assign partition columns (rows would migrate
 * between partitions — a rewrite shape this layout reserves for MERGE with
 * explicit sources); DELETE/UPDATE conditions admit subqueries —
 * non-correlated ones re-plan as the semi/anti join a SELECT would get,
 * correlated ones re-express as a non-correlated membership test over the
 * statement's own resolved plan ([[membershipRewrite]]); subqueries in
 * SET values refuse.
 *
 * Registered by `graft.plans.GraftExtensions` (post-hoc resolution rule).
 */
final case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if m.resolved || wideningBlockedOnly(m) =>
      graftRelation(m.targetTable) match {
        case None => m
        case Some(rel) =>
          val table = rel.table.asInstanceOf[GraftV2Table]
          val keys = equiKeys(m.mergeCondition, m.targetTable, m.sourceTable)
          if (isCanonicalStar(m) &&
            !spark.conf.get("spark.graft.dml.mergeOnRead", "false").toBoolean)
            // the classic upsert keeps its one-join fast path (no
            // table-wide discovery pass; source-partition-scoped contract).
            // Merge-on-read mode routes through the conditional engine
            // instead — its output lands as vectors + overlay rows with no
            // partition rewrite ([[Merge.mergeConditional]]).
            GraftMergeCommand(
              table.tableDefinition, table.tableBinding,
              m.sourceTable, keys, rel.schema)
          else if (m.resolved)
            translateConditional(m, table, rel.schema, keys)
          else m // widening-blocked but non-canonical: Spark's cast error stands
      }

    case u: UpdateTable if u.resolved =>
      graftRelation(u.table) match {
        case None => u
        case Some(rel) =>
          val table = rel.table.asInstanceOf[GraftV2Table]
          val defn = table.tableDefinition
          val partCols = defn.partitionSchema.columns.map(_.name).toSet
          // merge-on-read UPDATE handles cross-partition row migration
          // natively (old copy vector-hidden, new copy lands wherever its
          // values say); only the copy-on-write rewrite reserves that
          // shape for MERGE
          val morMode =
            spark.conf.get("spark.graft.dml.mergeOnRead", "false").toBoolean
          u.assignments.foreach { a =>
            rootAttr(a.key) match {
              case Some(k) if !morMode && partCols.exists(_.equalsIgnoreCase(k.name)) =>
                unsupported(s"UPDATE of partition column ${k.name} (rows would " +
                  "migrate between partitions; use MERGE with an explicit " +
                  "source, or SET spark.graft.dml.mergeOnRead=true)")
              case Some(_) => ()
              case None => unsupported(s"non-column assignment target ${a.key.sql}")
            }
          }
          u.assignments.foreach(a => rejectSubqueries(a.value))
          GraftUpdateCommand(
            defn, table.tableBinding,
            u.assignments.map(a => rootAttr(a.key).get.name -> new Detached(detach(a.value))),
            u.condition.map(c => new Detached(detach(membershipRewrite(c, u.table)))))
      }

    case d @ DeleteFromTable(target, cond) if d.resolved =>
      graftRelation(target) match {
        case None => d
        case Some(rel) =>
          val table = rel.table.asInstanceOf[GraftV2Table]
          val defn = table.tableDefinition
          val partCols = defn.partitionSchema.columns.map(_.name).toSet
          // partition-value-only predicates keep the metadata-only
          // SupportsDelete path (RemovePartition commit, zero data rewrite)
          // — but ONLY on a uniform fold: that path matches partitions by
          // the CURRENT scheme's column values, so on a mixed fold (after
          // a metadata-only evolution) old-era dirs keyed by the old
          // column would silently survive a predicate they match. Mixed
          // folds route to the row-level command, where merge-on-read
          // handles them and copy-on-write refuses with the
          // consolidation escape hatch named.
          val uniform = PartitionEvolution.eraSignatures(
            table.tableBinding.log.currentVersion(defn.name)).size <= 1
          if (!defn.isSnapshot && uniform && partitionOnly(cond, partCols)) d
          else
            GraftDeleteCommand(
              defn, table.tableBinding,
              new Detached(detach(membershipRewrite(cond, target))))
      }
  }

  private def graftRelation(target: LogicalPlan): Option[DataSourceV2Relation] =
    target.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftV2Table] => r
    }

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(s"graft SQL DML: unsupported: $what")

  private def rejectSubqueries(e: Expression): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      unsupported(s"subquery in condition: ${e.sql}")

  /** DELETE/UPDATE conditions admit subqueries, correlated or not.
    *
    * NON-correlated (`k IN (SELECT …)`, `EXISTS (SELECT …)`): the subquery
    * plan is already analyzed and self-contained, so the command's own
    * read re-anchors the outer attributes by name and Spark's subquery
    * planning rewrites the predicate into the semi/anti join it would be
    * in a SELECT — no driver-side materialization.
    *
    * CORRELATED (`EXISTS (SELECT 1 FROM s WHERE s.k = t.k)`): the outer
    * references bind to the STATEMENT's attribute ids, which do not exist
    * in the command's re-read — so [[membershipRewrite]] re-expresses the
    * WHOLE condition as a non-correlated membership test built from the
    * statement's own resolved nodes:
    *
    * {{{ struct(cols) IN (SELECT struct(cols) FROM target WHERE cond) }}}
    *
    * The correlation now closes over the target INSIDE the subquery
    * (ids consistent — standard decorrelation territory), while the outer
    * struct's attributes detach by name like any other condition and the
    * planner turns the test into one semi-join (left-anti for survivors).
    * Matching is by VALUE, which is exactly DML semantics: a
    * deterministic predicate holds for every copy of identical rows or
    * none. Struct equality in Spark is ordering-based — null FIELDS
    * compare equal — so rows carrying nulls in columns the predicate
    * never touches still match their own values (a bare tuple IN would
    * wrongly drop them to UNKNOWN). */
  private def membershipRewrite(cond: Expression, target: LogicalPlan): Expression =
    if (!cond.exists {
      case s: SubqueryExpression => s.isCorrelated
      case _ => false
    }) cond
    else {
      def rowStruct = CreateNamedStruct(
        target.output.flatMap(a => Seq(Literal(a.name), a)))
      val matched = org.apache.spark.sql.catalyst.plans.logical.Project(
        Seq(org.apache.spark.sql.catalyst.expressions.Alias(rowStruct, "__graft_row")()),
        Filter(cond, target))
      InSubquery(Seq(rowStruct), ListQuery(matched))
    }

  /** Re-anchor a resolved expression onto a fresh DataFrame: attribute ids
    * belong to the statement's relation, so rebind by NAME and let the
    * command's own query resolve them. */
  private def detach(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
  }

  /** A MERGE left unresolved ONLY because the analyzer's star-expansion
    * tried to cast a PROPERLY-WIDENED source struct down to the target's
    * narrow shape (nested autoMerge evolution: the source carries extra
    * struct fields). Such a statement is safe to intercept when
    * autoMergeSchema is on — the command keeps the source's wide shape
    * instead of the impossible down-cast; anything else stays with
    * Spark's own analysis error. */
  private def wideningBlockedOnly(m: MergeIntoTable): Boolean =
    spark.conf.get("spark.graft.dml.autoMergeSchema", "false").toBoolean &&
      m.targetTable.resolved && m.sourceTable.resolved && m.mergeCondition.resolved &&
      m.notMatchedBySourceActions.isEmpty && {
        val actions = m.matchedActions ++ m.notMatchedActions
        actions.nonEmpty && actions.forall {
          case UpdateAction(cond, assigns, _) =>
            cond.forall(_.resolved) && assigns.forall(wideningBlockedAssign)
          case InsertAction(cond, assigns) =>
            cond.forall(_.resolved) && assigns.forall(wideningBlockedAssign)
          case _ => false
        }
      }

  private def wideningBlockedAssign(a: Assignment): Boolean =
    a.resolved || (a.key.resolved && (a.value match {
      case c: Cast if c.child.resolved =>
        StructEvolution.isProperWidening(c.dataType, c.child.dataType)
      case _ => false
    }))

  private def rootAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case c: Cast               => rootAttr(c.child)
    case _                     => None
  }

  /** Mirror of `GraftV2Table.partitionOnly` in the catalyst domain: true
    * only for predicates the metadata-only delete path will accept. */
  private def partitionOnly(e: Expression, partCols: Set[String]): Boolean = e match {
    case And(l, r) => partitionOnly(l, partCols) && partitionOnly(r, partCols)
    case org.apache.spark.sql.catalyst.expressions.Or(l, r) =>
      partitionOnly(l, partCols) && partitionOnly(r, partCols)
    case EqualTo(a: AttributeReference, rhs) if rhs.foldable =>
      partCols.exists(_.equalsIgnoreCase(a.name))
    case EqualTo(lhs, a: AttributeReference) if lhs.foldable =>
      partCols.exists(_.equalsIgnoreCase(a.name))
    case In(a: AttributeReference, vs) if vs.forall(_.foldable) =>
      partCols.exists(_.equalsIgnoreCase(a.name))
    case Literal(true, _) => true // unconditional DELETE = drop every partition
    case _ => false
  }

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
          else unsupported(s"MERGE condition side not a plain target/source column: $a = $b")
        if (!t.name.equalsIgnoreCase(s.name))
          unsupported(s"MERGE key columns must share a name, got ${t.name} = ${s.name}")
        t.name
      case other => unsupported(s"non-equi MERGE condition clause: ${other.sql}")
    }
  }

  /** The analyzer's expansion of the canonical `WHEN MATCHED THEN UPDATE
    * SET * WHEN NOT MATCHED THEN INSERT *` upsert: EVERY target column
    * assigned, each from the same-named SOURCE column (possibly cast),
    * both clauses unconditional, nothing else. This shape keeps the
    * one-join [[GraftMergeCommand]] fast path; everything else goes
    * through the conditional clause engine. */
  private def isCanonicalStar(m: MergeIntoTable): Boolean = {
    val targetCols = m.targetTable.output.map(_.name.toLowerCase).toSet
    def starShaped(assigns: Seq[Assignment]): Boolean = {
      val covered = assigns.flatMap(a => rootAttr(a.key).map(_.name.toLowerCase)).toSet
      covered == targetCols && assigns.forall { a =>
        (rootAttr(a.key), rootAttr(a.value)) match {
          case (Some(k), Some(v)) =>
            k.name.equalsIgnoreCase(v.name) && m.sourceTable.outputSet.contains(v)
          case _ => false
        }
      }
    }
    (m.matchedActions match {
      case Seq(UpdateAction(None, assigns, _)) => starShaped(assigns)
      case _                                   => false
    }) && (m.notMatchedActions match {
      case Seq(InsertAction(None, assigns)) => starShaped(assigns)
      case _                                => false
    }) && m.notMatchedBySourceActions.isEmpty
  }

  /** Translate a resolved non-star MERGE into the conditional-clause
    * command. Attribute references in conditions and assignment values are
    * detached SIDE-AWARE (`__t_`/`__s_` prefixes) — both relations carry
    * the same column names, so plain by-name detachment would be ambiguous
    * inside the merge join. */
  private def translateConditional(
      m: MergeIntoTable,
      table: GraftV2Table,
      relationSchema: StructType,
      keys: Seq[String]): LogicalPlan = {
    val defn = table.tableDefinition
    val partCols = defn.partitionSchema.columns.map(_.name.toLowerCase).toSet
    def side(e: Expression): Detached = {
      rejectSubqueries(e)
      new Detached(e.transform {
        case a: AttributeReference if m.targetTable.outputSet.contains(a) =>
          UnresolvedAttribute(Seq("__t_" + a.name))
        case a: AttributeReference if m.sourceTable.outputSet.contains(a) =>
          UnresolvedAttribute(Seq("__s_" + a.name))
      })
    }
    def assigns(as: Seq[Assignment], clause: String): Seq[(String, Detached)] = as.map { a =>
      val k = rootAttr(a.key).getOrElse(
        unsupported(s"non-column assignment target ${a.key.sql} in $clause"))
      k.name -> side(a.value)
    }
    def updateLike(action: MergeAction, clause: String): (Option[Detached], Option[Seq[(String, Detached)]]) =
      action match {
        case UpdateAction(cond, as, _) =>
          as.foreach { a =>
            rootAttr(a.key).foreach { k =>
              // merge-on-read migrates rows natively (hide + re-land)
              if (partCols.contains(k.name.toLowerCase) &&
                !spark.conf.get("spark.graft.dml.mergeOnRead", "false").toBoolean)
                unsupported(s"UPDATE of partition column ${k.name} in $clause (rows would " +
                  "migrate between partitions; SET spark.graft.dml.mergeOnRead=true to allow)")
            }
          }
          (cond.map(side), Some(assigns(as, clause)))
        case DeleteAction(cond) => (cond.map(side), None)
        case other => unsupported(s"$clause action ${other.getClass.getSimpleName}")
      }
    val matched = m.matchedActions.map(updateLike(_, "WHEN MATCHED"))
    val notMatched = m.notMatchedActions.map {
      case InsertAction(cond, as) => (cond.map(side), assigns(as, "WHEN NOT MATCHED"))
      case other => unsupported(s"WHEN NOT MATCHED action ${other.getClass.getSimpleName}")
    }
    val nmbs = m.notMatchedBySourceActions.map(updateLike(_, "WHEN NOT MATCHED BY SOURCE"))
    GraftConditionalMergeCommand(
      defn, table.tableBinding, m.sourceTable, keys, matched, notMatched, nmbs, relationSchema)
  }
}

/** Opaque holder: keeps a detached expression OUT of the command node's
  * `expressions` traversal — CheckAnalysis would otherwise reject the
  * deliberately-unresolved by-name attributes before the command runs.
  * (Plain class, not a case class: QueryPlan recurses into Products.) */
private[spark] final class Detached(val expr: Expression) {
  override def toString: String = expr.sql
}

/** Shared copy-on-write machinery for the DML commands. */
private[spark] object GraftDml {

  def column(e: Expression): Column = org.apache.spark.sql.GraftSqlShim.column(e)

  /** Commit a COW rewrite derived from state `readCommit` with the
    * [[graft.core.TableVersions.commitRebase]] discipline: rebase over
    * concurrent disjoint-partition commits, refuse loudly on overlap. */
  def commit(
      defn: TableDefinition,
      binding: GraftTableCatalog.Binding,
      df: DataFrame,
      message: String,
      readCommit: graft.core.TableVersions.CommitId,
      alsoRemove: Seq[graft.core.Partition] = Nil): Unit = {
    import graft.spark.VersionContext.DatasetVersionOps
    val ctx = VersionContext(GraftV2Table.metastoreFor(binding, defn))
    df.versionedInsertIntoRebase(
      ctx, defn, UserId("sql"), UpdateMessage(message), readCommit,
      alsoRemove = alsoRemove)
    ()
  }
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
    // MERGE SCHEMA EVOLUTION (`SET spark.graft.dml.autoMergeSchema=true`,
    // the Delta autoMerge contract): NEW source columns survive the
    // alignment, the DECLARED schema widens (nullable, metadata-only
    // commit — the q62 posture), and the rewrite carries pre-evolution
    // rows with typed NULLs (Merge.mergeInto's kept alignment). NESTED
    // evolution rides the same flag: a source STRUCT column carrying
    // extra fields (a proper widening, [[StructEvolution.isWidening]])
    // keeps its wide shape through the alignment, kept rows conform with
    // typed NULLs inside mergeInto, and the widening lands as a
    // commit-anchored schema state so time travel reads the addressed
    // commit's struct shape ([[SchemaStates]]). Without the flag extra
    // source columns drop and struct sources cast down, as before.
    val autoMerge =
      session.conf.get("spark.graft.dml.autoMergeSchema", "false").toBoolean
    val extras =
      if (autoMerge && current.columns.nonEmpty)
        src.schema.filterNot(f => current.columns.exists(_.equalsIgnoreCase(f.name))).toSeq
      else Nil
    val structWide: Map[String, org.apache.spark.sql.types.DataType] =
      if (autoMerge && current.columns.nonEmpty)
        StructEvolution.widenedColumns(current.schema, src.schema)
      else Map.empty
    val aligned =
      if (current.columns.nonEmpty)
        src.select(current.schema.map { f =>
          val target = structWide.getOrElse(
            f.name.toLowerCase(java.util.Locale.ROOT), f.dataType)
          col(f.name).cast(target).as(f.name)
        } ++ extras.map(f => col(f.name)): _*)
      else
        src.select(relationSchema.map(f => col(f.name).as(f.name)): _*)
    val ctx = VersionContext(GraftV2Table.metastoreFor(binding, defn))
    // DATA FIRST, widening AFTER: a merge that fails (duplicate source
    // keys, OCC conflict, constraint refusal) must not leave the table
    // permanently widened with no data for the new column — the declared
    // schema and its audit commit land only once the data commit is in
    // (Delta folds both into one transaction; a versioned log is
    // append-only, so after-on-success is the equivalent posture). In the
    // one-commit gap a concurrent reader sees the PRE-evolution schema —
    // the new column appears with the declaration, never a phantom column
    // with no declaration.
    val preAnchor =
      if (structWide.nonEmpty) Some(binding.log.currentCommit(defn.name)) else None
    Merge.mergeInto(
      ctx, binding.log, defn, aligned, keys, UserId("sql"), UpdateMessage("MERGE (SQL)"))
    if (extras.nonEmpty || structWide.nonEmpty) {
      val key = defn.name.fullyQualifiedName
      val base = binding.tables.get(key).flatMap(_._2).getOrElse(relationSchema)
      val widened = org.apache.spark.sql.types.StructType(
        base.map(f => structWide.get(f.name.toLowerCase(java.util.Locale.ROOT))
          .map(t => f.copy(dataType = t)).getOrElse(f)) ++
          extras.map(f => f.copy(nullable = true)))
      binding.tables.put(key, (defn, Some(widened)))
      val parts = Seq(
        if (extras.nonEmpty)
          Some(s"ADD COLUMNS (${extras.map(_.name).mkString(", ")})") else None,
        if (structWide.nonEmpty)
          Some(s"WIDEN COLUMNS (${structWide.keys.toSeq.sorted.mkString(", ")})") else None
      ).flatten.mkString(", ")
      GraftV2Table.metastoreFor(binding, defn).commit(defn.name,
        graft.core.TableVersions.TableUpdate(
          UserId("sql"),
          UpdateMessage(s"MERGE SCHEMA EVOLUTION $parts"),
          java.time.Instant.now(), Nil))
      // struct widenings anchor a schema state: time travel to the merge's
      // own data commit (or earlier) keeps reading the narrow struct shape
      preAnchor.foreach(pre => SchemaStates.record(
        session, defn, base, pre, widened,
        binding.log.currentCommit(defn.name)))
    }
    Seq.empty
  }
}

/** Driver-side execution of a CONDITIONAL MERGE (clauses beyond the
  * canonical star upsert): materialize the source and hand the detached
  * side-aware clause expressions to [[Merge.mergeConditional]] — table-wide
  * matching via narrow discovery, one full-outer clause join, affected
  * partitions only rewritten, one time-travelable commit. */
final case class GraftConditionalMergeCommand(
    defn: TableDefinition,
    binding: GraftTableCatalog.Binding,
    source: LogicalPlan,
    keys: Seq[String],
    matched: Seq[(Option[Detached], Option[Seq[(String, Detached)]])],
    notMatched: Seq[(Option[Detached], Seq[(String, Detached)])],
    notMatchedBySource: Seq[(Option[Detached], Option[Seq[(String, Detached)]])],
    relationSchema: StructType) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.GraftSqlShim.ofRows(session, source)
    val ctx = VersionContext(GraftV2Table.metastoreFor(binding, defn))
    def c(d: Detached): Column = GraftDml.column(d.expr)
    def set(s: Seq[(String, Detached)]): Seq[(String, Column)] =
      s.map { case (n, d) => n -> c(d) }
    Merge.mergeConditional(
      ctx, binding.log, defn, src, keys,
      matched = matched.map { case (cond, as) => Merge.WhenMatched(cond.map(c), as.map(set)) },
      notMatched = notMatched.map { case (cond, vs) => Merge.WhenNotMatched(cond.map(c), set(vs)) },
      notMatchedBySource = notMatchedBySource.map { case (cond, as) =>
        Merge.WhenMatched(cond.map(c), as.map(set)) },
      userId = UserId("sql"),
      message = UpdateMessage("MERGE (SQL)"),
      emptySchema = Some(relationSchema))
    Seq.empty
  }
}

/** Copy-on-write `UPDATE`: rewrite the partitions holding matching rows
  * with the assignments applied (matching rows updated, the partition's
  * other rows carried as-is); untouched partitions keep their version. */
final case class GraftUpdateCommand(
    defn: TableDefinition,
    binding: GraftTableCatalog.Binding,
    assignments: Seq[(String, Detached)],
    condition: Option[Detached]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    // MERGE-ON-READ mode (`SET spark.graft.dml.mergeOnRead=true`): hide the
    // matched preimages behind deletion vectors and land the postimages as
    // a row overlay — O(matched rows) written, no partition rewritten, and
    // it works on MIXED folds where copy-on-write must refuse.
    if (session.conf.get("spark.graft.dml.mergeOnRead", "false").toBoolean) {
      RowOverlay.update(
        VersionContext(GraftV2Table.metastoreFor(binding, defn)), defn,
        condition.map(d => GraftDml.column(d.expr))
          .getOrElse(org.apache.spark.sql.functions.lit(true)),
        assignments.map { case (n, e) => n -> GraftDml.column(e.expr) },
        UserId("sql"), UpdateMessage("UPDATE (SQL, merge-on-read)"))
      return Seq.empty
    }
    // copy-on-write UPDATE rewrites whole partitions under the CURRENT
    // scheme without removing old-era dirs — on a mixed fold (after a
    // metadata-only evolution) the old copies would stay referenced and
    // the updated rows duplicate; refuse until consolidateEras
    PartitionEvolution.requireUniformFold(binding.log, defn, "UPDATE (SQL)")
    val cond = condition.map(d => GraftDml.column(d.expr))
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    // the state this rewrite derives from (rebase discipline)
    val readCommit = binding.log.currentCommit(defn.name)
    // DV-aware + column-mapped: rewriting from a raw read would resurrect
    // hidden rows / break against logical column references
    val current = ColumnMapping.applyLogical(
      DeletionVectors.read(session, binding.log, defn),
      session, binding.log, defn, None)
    if (current.columns.isEmpty) return Seq.empty // never written
    // a no-match UPDATE must not commit: the history would gain a junk
    // entry (and a snapshot table a full identical rewrite) for a no-op
    if (current.where(cond).isEmpty) return Seq.empty
    val scope =
      if (defn.isSnapshot) current
      else {
        // touched-partition set is #partitions rows — metadata-sized,
        // safe to broadcast at any scale
        val partCols = defn.partitionSchema.columns.map(_.name)
        val touched = current.where(cond).select(partCols.map(col): _*).distinct()
        current.join(broadcast(touched), partCols.toSeq, "left_semi")
      }
    val byName = assignments.map { case (n, e) => n.toLowerCase -> GraftDml.column(e.expr) }.toMap
    val updated = scope.select(scope.columns.map { c =>
      byName.get(c.toLowerCase) match {
        case Some(v) => when(cond, v).otherwise(col(c)).as(c)
        case None    => col(c)
      }
    }: _*)
    GraftDml.commit(defn, binding, updated, "UPDATE (SQL)", readCommit)
    Seq.empty
  }
}

/** Copy-on-write row-level `DELETE`: rewrite the partitions holding
  * matching rows WITHOUT those rows; untouched partitions keep their
  * version. (Partition-value-only deletes never reach here — they stay on
  * the metadata-only RemovePartition path.) A partition whose EVERY row
  * matched produces no surviving rows — its `RemovePartition` op rides
  * the same atomic rebase-checked commit (`alsoRemove`), so there is no
  * window where the emptied partition still serves its rows and no racer
  * can resurrect it unnoticed. Reading `current` twice is safe here: it
  * scans immutable version dirs, not a re-runnable source query. */
final case class GraftDeleteCommand(
    defn: TableDefinition,
    binding: GraftTableCatalog.Binding,
    condition: Detached) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    import graft.core.{ColumnValue, Partition, PartitionedTableVersion}
    import graft.core.TableVersions.{TableOperation, TableUpdate}
    val cond = GraftDml.column(condition.expr)
    // MERGE-ON-READ mode (`SET spark.graft.dml.mergeOnRead=true`): hide the
    // matched rows behind a deletion-vector sidecar + empty-ops commit
    // instead of rewriting partitions — O(matched rows) written, no data
    // files moved, the 100 TB shape for scattered row deletes (a predicate
    // touching every partition costs a full-table rewrite copy-on-write).
    // DVs resolve per file, so this also works on a MIXED fold where the
    // copy-on-write path must refuse. Partition-value-only predicates
    // reach here only on mixed folds — on a uniform fold they stay on the
    // metadata-only RemovePartition path (strictly better than both; on a
    // mixed fold that path would match only current-scheme dirs and leave
    // old-era rows alive). UPDATE stays copy-on-write: a DV expresses
    // hidden rows, not changed values.
    if (session.conf.get("spark.graft.dml.mergeOnRead", "false").toBoolean) {
      DeletionVectors.delete(
        VersionContext(GraftV2Table.metastoreFor(binding, defn)), binding.log,
        defn, cond, UserId("sql"), UpdateMessage("DELETE (SQL, merge-on-read)"))
      return Seq.empty
    }
    // the state this rewrite derives from (rebase discipline)
    val readCommit = binding.log.currentCommit(defn.name)
    // DV-aware + column-mapped (see GraftUpdateCommand)
    val current = ColumnMapping.applyLogical(
      DeletionVectors.read(session, binding.log, defn),
      session, binding.log, defn, None)
    if (current.columns.isEmpty) return Seq.empty
    if (defn.isSnapshot) {
      // survivors = rows where the predicate is NOT TRUE (false OR null):
      // SQL DELETE removes only WHERE-true rows
      GraftDml.commit(
        defn, binding,
        current.where(!org.apache.spark.sql.functions.coalesce(
          cond, org.apache.spark.sql.functions.lit(false))),
        "DELETE (SQL)", readCommit)
      return Seq.empty
    }
    // partition-granular rewrite: removes are computed against the
    // CURRENT scheme's dirs only — a mixed fold's old-era copies would
    // survive and resurrect the deleted rows; refuse until consolidateEras
    PartitionEvolution.requireUniformFold(binding.log, defn, "DELETE (SQL)")
    val partCols = defn.partitionSchema.columns
    val names = partCols.map(_.name)
    val touchedRows = current.where(cond)
      .select(names.map(c => col(c).cast("string")): _*).distinct().collect()
    if (touchedRows.isEmpty) return Seq.empty // nothing matched — no commit
    val touched = touchedRows.map { r =>
      Partition(partCols.zipWithIndex.map { case (c, i) => ColumnValue(c, r.getString(i)) })
    }.toList
    // schema built in the SAME order the rows were selected (partition
    // schema order, all strings after the cast) — filtering current.schema
    // would follow the data's column order instead and misalign values for
    // multi-column partition schemas
    val touchedDf = current.sparkSession.createDataFrame(
      java.util.Arrays.asList(touchedRows: _*),
      StructType(names.map(n =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType))))
    val scope = current.join(broadcast(touchedDf), names.toSeq, "left_semi")
    val before = binding.log.currentVersion(defn.name) match {
      case PartitionedTableVersion(pvs) => pvs
      case other                        => sys.error(s"row-level delete does not apply to $other")
    }
    // fully-emptied partitions produce no staged dir; their RemovePartition
    // ops ride the SAME rebase-checked commit (alsoRemove) — one atomic
    // commit, no transient window serving the deleted rows, and the
    // emptied partitions sit in the conflict scope
    GraftDml.commit(
      defn, binding,
      scope.where(!org.apache.spark.sql.functions.coalesce(
        cond, org.apache.spark.sql.functions.lit(false))),
      "DELETE (SQL)", readCommit, alsoRemove = touched.filter(before.contains))
    Seq.empty
  }
}
