package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Structural plan assertions that survive AQE. The adaptive wrapper and
  * every materialized query stage are LEAF nodes to `TreeNode.collect`,
  * so a plain collect over `executedPlan` sees only the top fragment of
  * the final plan — these helpers recurse through the wrappers.
  */
object PlanAsserts {
  /** Final physical plan with the AQE root wrapper(s) removed. Run the
    * query (e.g. `collect()`) first — before execution the wrapper still
    * holds the initial plan.
    */
  def stripAQE(plan: SparkPlan): SparkPlan = plan match {
    case a: AdaptiveSparkPlanExec => stripAQE(a.executedPlan)
    case q: QueryStageExec => stripAQE(q.plan)
    case p => p
  }

  /** `collect` that also descends into AQE query stages and nested
    * adaptive plans (both are leaves to the stock traversal).
    */
  def deepCollect[T](plan: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = if (pf.isDefinedAt(plan)) Seq(pf(plan)) else Seq.empty
    val kids = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case p => p.children
    }
    here ++ kids.flatMap(deepCollect(_)(pf))
  }

  /** Every shuffle boundary in the subtree (stages unwrapped, so each
    * shuffle is seen exactly once as its exchange node).
    */
  def shuffles(plan: SparkPlan): Seq[SparkPlan] =
    deepCollect(plan) { case e: ShuffleExchangeLike => e }

  /** All broadcast hash joins in the subtree, stages included. */
  def broadcastHashJoins(plan: SparkPlan): Seq[BroadcastHashJoinExec] =
    deepCollect(plan) { case j: BroadcastHashJoinExec => j }

  /** The streamed (non-broadcast) side of a broadcast hash join —
    * `streamedPlan` itself is protected in Spark.
    */
  def streamedSide(j: BroadcastHashJoinExec): SparkPlan = j.buildSide match {
    case BuildRight => j.left
    case BuildLeft  => j.right
  }
}
