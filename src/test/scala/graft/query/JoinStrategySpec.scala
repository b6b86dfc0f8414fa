package graft.query

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import graft.{PlanAsserts, SparkFixture}

/** The three equi-join regimes must actually PLAN as pinned — a hint that
  * silently degrades to another strategy would invalidate the scale
  * claims each row makes (J1 broadcast / J2 sort-merge / J2h shuffle-hash).
  */
class JoinStrategySpec extends AnyFunSuite with SparkFixture {

  private def planOf(name: String) = {
    val df = graft.SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.collect()
    PlanAsserts.stripAQE(df.queryExecution.executedPlan)
  }

  test("q_join_shufflehash plans a ShuffledHashJoin") {
    val joins = PlanAsserts.deepCollect(planOf("q_join_shufflehash")) {
      case j: ShuffledHashJoinExec => j
    }
    assert(joins.nonEmpty, "no ShuffledHashJoinExec in the plan")
  }

  test("q_join_sortmerge plans a SortMergeJoin") {
    val joins = PlanAsserts.deepCollect(planOf("q_join_sortmerge")) {
      case j: SortMergeJoinExec => j
    }
    assert(joins.nonEmpty, "no SortMergeJoinExec in the plan")
  }

  test("q_join_broadcast plans a BroadcastHashJoin") {
    val joins = PlanAsserts.deepCollect(planOf("q_join_broadcast")) {
      case j: BroadcastHashJoinExec => j
    }
    assert(joins.nonEmpty, "no BroadcastHashJoinExec in the plan")
  }
}
