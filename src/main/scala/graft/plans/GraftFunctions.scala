package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim, SparkSession, SparkSessionExtensions, SparkSessionExtensionsProvider}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Column-API entry points for graft's native Catalyst expressions. */
object GraftFunctions {

  /** `cosine_sim(a, b)` — see [[CosineSimilarity]]. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlShim.column(
      CosineSimilarity(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** `dot_product(a, b)` — see [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlShim.column(
      DotProduct(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** `srp_bucket(vec, nPlanes)` — see [[SrpBucket]]. */
  def srpBucket(vec: Column, nPlanes: Int): Column =
    GraftSqlShim.column(SrpBucket(GraftSqlShim.expression(vec), nPlanes))

  /** `minhash_signature(tokens)` — see [[MinHashSignature]]. */
  def minhashSignature(tokens: Column, nHashes: Int = 16): Column =
    GraftSqlShim.column(MinHashSignature(GraftSqlShim.expression(tokens), nHashes))

  /** `shingle_hashes(tokens)` — see [[ShingleHashes]]. */
  def shingleHashes(tokens: Column): Column =
    GraftSqlShim.column(ShingleHashes(GraftSqlShim.expression(tokens)))

  /** `token_hashes(tokens)` — see [[TokenHashes]]. */
  def tokenHashes(tokens: Column): Column =
    GraftSqlShim.column(TokenHashes(GraftSqlShim.expression(tokens)))

  /** `span_hashes(tokens, width)` — see [[SpanHashes]]. */
  def spanHashes(tokens: Column, width: Int): Column =
    GraftSqlShim.column(SpanHashes(GraftSqlShim.expression(tokens), width))

  private type Builder =
    Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression

  /** (name, info, builder) for every native expression. */
  private[plans] val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "minhash_signature takes exactly 1 argument")
        MinHashSignature(children.head)
      }),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "shingle_hashes takes exactly 1 argument")
        ShingleHashes(children.head)
      }),
    (FunctionIdentifier("token_hashes"),
      new ExpressionInfo(classOf[TokenHashes].getName, "token_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "token_hashes takes exactly 1 argument")
        TokenHashes(children.head)
      }),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "dot_product takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))

  /** Register every graft SQL function on an existing session (the
    * runtime-registration analogue of [[GraftExtensions]]). */
  def register(spark: SparkSession): Unit =
    sqlFunctions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** `SparkSessionExtensions` hook: build sessions with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` to get
  * graft's SQL functions — plus SQL MERGE INTO / UPDATE /
  * row-level DELETE on graft catalog tables ([[graft.spark.GraftDmlRule]]) — without touching the session
  * afterwards. */
class GraftExtensions extends SparkSessionExtensionsProvider {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctions.sqlFunctions.foreach { case (ident, info, builder) =>
      extensions.injectFunction((ident, info, builder))
    }
    // post-hoc, ORDER MATTERS: generated-column partition-filter
    // derivation first (it matches Filter-over-relation shapes the DV
    // rewrite would obscure; the injected conjunct then pushes into
    // whichever scan serves the relation), then the DV scan rewrite so
    // MERGE sources and subqueries read merge-on-read state before
    // GraftDmlRule captures them into commands (DML targets are skipped
    // by the DV rule — the commands read DV-aware themselves)
    extensions.injectPostHocResolutionRule(s => graft.spark.GraftGeneratedPruningRule(s))
    extensions.injectPostHocResolutionRule(s => graft.spark.GraftDvScanRule(s))
    // runs after resolution has aligned the MERGE assignments and
    // before the planner's row-level-operation check would reject the table
    extensions.injectPostHocResolutionRule(s => graft.spark.GraftDmlRule(s))
    // maintenance statements (OPTIMIZE / ZORDER / VACUUM) — everything else
    // delegates to the stock parser
    extensions.injectParser((_, parser) => new graft.spark.GraftSqlParser(parser))
    // SQL CDC: FROM table_changes('cat.db.t', c1, c2) resolves to the
    // commit-log version diff (VersionedReader.readChanges)
    extensions.injectTableFunction(graft.spark.GraftTableChanges.tableFunction)
    // metadata inspection: graft_partitions / graft_files (the Iceberg
    // table$partitions / table$files idiom as TVFs)
    extensions.injectTableFunction(graft.spark.GraftMetadataTables.partitionsFunction)
    extensions.injectTableFunction(graft.spark.GraftMetadataTables.filesFunction)
  }
}
