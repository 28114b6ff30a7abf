package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to two `private[sql]` seams of Spark's classic API.
  *
  * Lives under `org.apache.spark.sql` solely to satisfy the access
  * modifier — the standard technique Spark-native libraries use to reach
  * the Column↔Expression and LogicalPlan→DataFrame conversions that
  * DSv2 analyzer extensions need (Spark 4 Columns wrap ColumnNodes, not
  * Expressions, so there is no public constructor for either direction).
  * Nothing else of Spark's internals is touched, and nothing here is
  * stateful.
  */
object GraftShims {

  /** An analyzed/planned LogicalPlan as a DataFrame (classic
    * `Dataset.ofRows`). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The Catalyst Expression behind a Column (requires a classic-session
    * context for ColumnNode conversion). */
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** A configured catalog plugin by name (CatalogManager is
    * `private[sql]`; the returned CatalogPlugin is public API). */
  def catalogPlugin(spark: SparkSession,
      name: String): connector.catalog.CatalogPlugin =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.catalogManager.catalog(name)
}
