package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Grid-pruned skyline ≡ the brute-force strict-dominance definition —
  * the law the oracle can't state (the oracle restates the sweep; this
  * pins sweep-vs-definition, including ties and pruning transitivity).
  */
class SkylineSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def bruteFrontier(pts: Seq[(Long, Double, Double)]) =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, ox, oy) => ox > x && oy > y }
    }.map(_._1).toSet

  test("skyline equals brute force on pseudo-random points") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 500L).map(i =>
      (i, rnd.nextInt(100).toDouble, rnd.nextInt(100).toDouble))
    val got = Skyline.skyline(
        pts.toDF("id", "x", "y").repartition(7), $"x", $"y", buckets = 8)
      .select("id").as[Long].collect().toSet
    assert(got === bruteFrontier(pts))
  }

  test("strictness: equal-x or equal-y rows never dominate each other") {
    // staircase with ties: (5,5) and (5,9) share x; (5,9) and (9,9) share y
    val pts = Seq((1L, 5.0, 5.0), (2L, 5.0, 9.0), (3L, 9.0, 9.0),
      (4L, 9.0, 1.0), (5L, 1.0, 1.0))
    val got = Skyline.skyline(pts.toDF("id", "x", "y"), $"x", $"y",
        buckets = 2)
      .select("id").as[Long].collect().toSet
    // (1,5,5): dominated by (3,9,9). (5,1,1): dominated too. The rest are
    // pairwise tied in one dimension → all survive.
    assert(got === Set(2L, 3L, 4L))
    assert(got === bruteFrontier(pts))
  }

  test("empty or all-null input yields an empty frontier, not an NPE") {
    val empty = Seq.empty[(Long, Double, Double)].toDF("id", "x", "y")
    assert(Skyline.skyline(empty, $"x", $"y").count() === 0L)
    val allNull = Seq((1L, Option.empty[Double], Option.empty[Double]))
      .toDF("id", "x", "y")
    val got = Skyline.skyline(allNull, $"x", $"y")
    assert(got.count() === 0L)
    assert(got.columns.toSeq === Seq("id", "x", "y"))
  }

  test("NaN coordinates are excluded like nulls, not NPE'd or dominant") {
    val pts = Seq((1L, 5.0, 5.0), (2L, Double.NaN, 99.0),
      (3L, 99.0, Double.NaN), (4L, 9.0, 9.0))
    val got = Skyline.skyline(pts.toDF("id", "x", "y"), $"x", $"y",
        buckets = 4)
      .select("id").as[Long].collect().toSet
    // rows 2 and 3 drop (NaN has no place in a dominance order — Spark's
    // NaN-is-largest ordering would otherwise make row 2 dominate all);
    // the frontier of the remaining points is row 4 alone
    assert(got === Set(4L))
  }

  test("the exact sweep never plans a single-partition stage") {
    // The round-6 finding: an unpartitioned Window.orderBy put the whole
    // staircase sliver on ONE task. Capture every execution the operator
    // runs and assert the window-bearing plan (the sweep) shuffles by
    // hash, never to SinglePartition. (The bounded min/max head() IS a
    // global aggregate — that SinglePartition carries 32 rows and is
    // exempt, which is why the assertion keys on Window plans only.)
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized {
          plans += graft.PlanAsserts.stripAQE(qe.executedPlan).toString }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val pts = (1L to 400L).map(i =>
        (i, (i % 23).toDouble, ((i * 7) % 19).toDouble))
      Skyline.skyline(pts.toDF("id", "x", "y").repartition(5),
        $"x", $"y", buckets = 8).count()
      // QueryExecutionListener fires async on the listener bus — poll
      // until the window-bearing sweep plan lands (bounded wait)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      def windowPlans =
        plans.synchronized { plans.filter(_.contains("Window")).toList }
      while (windowPlans.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val wp = windowPlans
      assert(wp.nonEmpty, "no window-bearing execution captured")
      wp.foreach(p => assert(!p.contains("SinglePartition"),
        s"sweep planned a single-partition stage:\n$p"))
    } finally spark.listenerManager.unregister(l)
  }

  test("a dense far corner prunes almost everything yet changes nothing") {
    val low = (1L to 300L).map(i => (i, (i % 17).toDouble, (i % 13).toDouble))
    val high = Seq((1000L, 100.0, 100.0)) // dominates every low point
    val pts = low ++ high
    val got = Skyline.skyline(pts.toDF("id", "x", "y"), $"x", $"y",
        buckets = 4)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1000L))
  }
}
