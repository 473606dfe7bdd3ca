package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversion for
  * graft's native Catalyst expressions (Spark 4 moved `Column` onto
  * ColumnNode; classic conversions live in `classic.ExpressionUtils`), and
  * into `Dataset.ofRows` for wrapping graft's custom logical plans. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** Drop cached catalog instances so a changed `spark.sql.catalog.*` conf
    * (e.g. a new graft warehouse) takes effect on next reference. */
  def resetCatalogs(spark: SparkSession): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.catalogManager.reset()

  /** Block until the async listener bus has delivered all queued events (or
    * the timeout passes) — deterministic metric collection for specs/benches
    * that read `SparkListener` task metrics after an action (a fixed sleep
    * can under- or over-wait on a loaded host). */
  def waitListenerBusEmpty(spark: SparkSession, timeoutMs: Long = 30000L): Unit =
    spark.asInstanceOf[classic.SparkSession].sparkContext.listenerBus
      .waitUntilEmpty(timeoutMs)
}
