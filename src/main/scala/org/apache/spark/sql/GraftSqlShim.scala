package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression conversion (the standard
  * package-placement idiom for Spark extension libraries). */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Hive path-name escaping, exactly as Spark's `partitionBy` writes
    * partition directories (`ExternalCatalogUtils.escapePathName`). */
  def escapePathName(part: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(part)

  def unescapePathName(path: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(path)

  /** `private[sql]` Dataset.ofRows — execute a resolved LogicalPlan as a
    * DataFrame (used by the MERGE INTO command). */
  def ofRows(
      session: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
