package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset,
  ExpressionUtils, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal private[sql] bridge for the engine's custom logical plans
  * (`graft.plans`): wraps a resolved LogicalPlan back into a DataFrame
  * and registers planner strategies on a live session. Isolated here so
  * the rest of the engine stays on the public API.
  */
object ClassicBridge {

  /** Dataset.ofRows for an externally-constructed logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Column ⇄ catalyst Expression, for expressions that can't route
    * through the function registry (e.g. a constructor carrying a
    * Broadcast handle, [[graft.functions.SubwordCountBound]]).
    */
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Idempotently add a planner strategy to a running session (the
    * config-time path is `spark.sql.extensions=graft.functions.
    * GraftExtensions`, which injects the same strategy). Presence is
    * checked against the planner's FULL strategy list — extensions-
    * injected strategies live in extraPlanningStrategies, not
    * experimental.extraStrategies, and a duplicate would make every
    * matching node plan twice.
    */
  def ensureStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val classic = spark.asInstanceOf[ClassicSparkSession]
    val present = classic.sessionState.planner.strategies
      .exists(_.getClass == strategy.getClass)
    if (!present)
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ strategy
  }
}
