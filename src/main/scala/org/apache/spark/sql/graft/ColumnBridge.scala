package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, ExpressionUtils, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.SparkStrategy

/** Column ⇄ Expression ⇄ LogicalPlan bridge for graft's custom Catalyst
  * surface (expressions and whole-operator plans).
  *
  * Spark 4 made `Column` a thin wrapper over `ColumnNode` and scoped the
  * converter (`ExpressionUtils`) and `Dataset.ofRows` `private[sql]`, so
  * extension libraries shipping native `Expression`s / `LogicalPlan`s need
  * one file in the `org.apache.spark.sql` package tree — this is that file,
  * and the ONLY place graft reaches into Spark-private scope. Everything
  * else uses public APIs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column → Expression conversion. `expression` wraps the column's
    * node in a lazy `ColumnNodeExpression` that drags the (non-serializable)
    * internal node into any task closure that captures the tree; this
    * converts all the way down so the result is a pure catalyst tree.
    */
  def expressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Analyzed logical plan of a DataFrame (attributes fully resolved). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataset[_]].queryExecution.analyzed

  /** Wrap a (resolved) logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** Deterministically release the storage blocks of a `localCheckpoint`'d
    * DataFrame once every consumer has materialized. Checkpoint blocks are
    * NOT freed by `clearCache()`; without this they live until the RDD is
    * garbage-collected, which a long-lived session with a large driver heap
    * may not do for hours. The checkpointed frame becomes unrecomputable —
    * never run it again after calling this.
    *
    * Accepts ONLY the checkpointed frame itself (plan root = the
    * checkpoint's `LogicalRDD`). A derived frame is rejected: its plan can
    * embed OTHER live RDD-backed inputs (e.g. a join of two checkpoints),
    * and a tree-wide unpersist would silently make those unrecomputable
    * too.
    */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.asInstanceOf[CDataset[_]].queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case other => throw new IllegalArgumentException(
        "releaseLocalCheckpoint takes the localCheckpoint()'d frame itself; " +
          s"got a derived plan rooted at ${other.nodeName}")
    }

  /** Idempotently install a planner strategy on an already-built session
    * (the `spark.sql.extensions=graft.functions.GraftExtensions` route is
    * the cluster deployment path; this is the library-call path).
    */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[CSparkSession]
    if (!cs.experimental.extraStrategies.contains(s)) {
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
    }
  }
}
