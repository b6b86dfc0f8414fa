package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Registry-wide plan lint: EVERY `SparkEntry.queries` key must plan
  * without the two classic scale-killers, as a standing gate rather than
  * per-operator spot checks:
  *
  *  1. no `CartesianProductExec` anywhere — an O(n·m) join is never the
  *     intended plan in this engine;
  *  2. a `BroadcastNestedLoopJoin` only with a provably-1-row build side
  *     (a global aggregate or a literal relation) — the broadcast-scalar
  *     crossJoin pattern several keys use to attach a corpus-wide cutoff;
  *     anything else is a disguised cartesian;
  *  3. no unpartitioned `Window` / `WindowGroupLimit` — a global window
  *     funnels the stage through ONE task (the round-6 skyline finding,
  *     promoted from a one-off spec assertion to an inventory-wide law).
  *
  * Lints run on the pre-AQE physical plan (`sparkPlan`): these are
  * NEGATIVE properties — AQE can upgrade a join, but it never introduces
  * a cartesian or removes a window's partitioning. Building the 165 plans
  * executes the driver-side stages some builders contain (k-means seeds,
  * BPE rounds, store setup), so the lint runs on sf0.001.
  */
class PlanLintSpec extends AnyFunSuite with SparkFixture {

  private val sfDir = "/root/testdata/sf0.001"

  /** True when a plan subtree can emit at most one row: a global
    * aggregate (no grouping keys) or a one-row local/range relation,
    * looked up through unary wrappers.
    */
  private def atMostOneRow(p: SparkPlan): Boolean = p match {
    case a: HashAggregateExec => a.groupingExpressions.isEmpty
    case a: ObjectHashAggregateExec => a.groupingExpressions.isEmpty
    case a: SortAggregateExec => a.groupingExpressions.isEmpty
    case l: org.apache.spark.sql.execution.LocalTableScanExec =>
      l.rows.lengthCompare(1) <= 0
    case u if u.children.length == 1 => atMostOneRow(u.children.head)
    case _ => false
  }

  /** Keys whose BroadcastNestedLoopJoin build side is bounded by
    * CONSTRUCTION rather than provably 1-row — each carries its bound.
    * The companion assertion below keeps this list honest: a key listed
    * here must actually plan a BNLJ, so stale entries fail the lint too.
    */
  private val boundedBnlj: Map[String, String] = Map(
    "q_cosine_topk" -> "brute-force top-k baseline: 10 fixed query ids x corpus",
    "q_ann_ivf_append" -> "post-append probe set: 10 fixed query ids",
    "q_knn_graph" -> "in-query exact recall audit: 50 fixed query ids",
    "q_ngram_jaccard" -> "exact-Jaccard oracle pairs over a <=20-doc sample",
    "q_join_range" -> "range join against a 4-row literal band table",
    "q_negative_sample" ->
      "L33 sampler: 8 fixed anchor ids x corpus, cosine-pruned then heap-bounded",
    "q_hybrid_rrf" ->
      "L35 cosine arm: 5 fixed query vectors x corpus, heap-bounded (TopK)")

  test("every registry key plans cartesian-free with partitioned windows") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    val sawBnlj = scala.collection.mutable.Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.sparkPlan
        PlanAsserts.deepCollect(plan) { case c: CartesianProductExec => c }
          .foreach(_ => bad += s"$name: CartesianProduct")
        PlanAsserts.deepCollect(plan) { case j: BroadcastNestedLoopJoinExec => j }
          .foreach { j =>
            val build = j.buildSide match {
              case BuildRight => j.right
              case BuildLeft => j.left
            }
            if (atMostOneRow(build)) ()
            else if (boundedBnlj.contains(name)) sawBnlj += name
            else
              bad += s"$name: BroadcastNestedLoopJoin with a multi-row " +
                s"build side:\n${build.treeString.linesIterator.take(6).mkString("\n")}"
          }
        PlanAsserts.deepCollect(plan) {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.foreach(_ => bad += s"$name: unpartitioned Window")
        PlanAsserts.deepCollect(plan) {
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
        }.foreach(_ => bad += s"$name: unpartitioned WindowGroupLimit")
      } catch {
        case e: Throwable =>
          bad += s"$name: plan build failed: ${e.getMessage}"
      }
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
    // the whitelist can't rot: every documented bounded-BNLJ key must
    // still actually plan one (a rewrite that removes it should also
    // remove its entry here)
    val stale = boundedBnlj.keySet -- sawBnlj
    assert(stale.isEmpty, s"whitelisted keys no longer plan a BNLJ: $stale")
  }
}
