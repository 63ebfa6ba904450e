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

  /** `minhash_signature(tokens)` — see [[MinHashSignature]]. */
  def minhashSignature(tokens: Column, nHashes: Int = 16): Column =
    GraftSqlShim.column(MinHashSignature(GraftSqlShim.expression(tokens), nHashes))

  /** `shingle_hashes(tokens)` — see [[ShingleHashes]]. */
  def shingleHashes(tokens: Column): Column =
    GraftSqlShim.column(ShingleHashes(GraftSqlShim.expression(tokens)))

  /** Register `cosine_sim` for SQL text use on an existing session (the
    * runtime-registration analogue of [[GraftExtensions]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      })
}

/** `SparkSessionExtensions` hook: build sessions with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` to get
  * graft's SQL functions without touching the session afterwards. */
class GraftExtensions extends SparkSessionExtensionsProvider {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children.head, children(1))))
}
