package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class TopKPerKeySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, key: String,
      order: Seq[org.apache.spark.sql.Column], k: Int) =
    df.withColumn("_rn", row_number().over(
        Window.partitionBy(key).orderBy(order: _*)))
      .filter(col("_rn") <= k).drop("_rn")

  test("matches the window row_number form exactly, ties broken") {
    val df = (1 to 5000).map(i => (s"g${i % 37}", i * 2654435761L % 1000, i.toLong))
      .toDF("g", "score", "id")
    val ord = Seq(col("score").desc, col("id").asc)
    val ours = TopK.perKey(df, Seq("g"), ord, k = 5)
      .orderBy(col("g"), col("score").desc, col("id")).collect()
    val ref = windowForm(df, "g", ord, 5)
      .orderBy(col("g"), col("score").desc, col("id")).collect()
    assert(ours.toSeq == ref.toSeq)
  }

  test("k larger than the group size returns the whole group") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    val out = TopK.perKey(df, Seq("g"), Seq(col("v").desc), k = 10)
      .orderBy("g", "v").as[(String, Int)].collect()
    assert(out.toSeq == Seq(("a", 1), ("a", 2), ("b", 3)))
  }

  test("ascending order keeps the smallest rows") {
    val df = (1 to 100).map(i => (i % 3, i)).toDF("g", "v")
    val out = TopK.perKey(df, Seq("g"), Seq(col("v").asc), k = 2)
      .orderBy("g", "v").as[(Int, Int)].collect()
    assert(out.toSeq == Seq((0, 3), (0, 6), (1, 1), (1, 4), (2, 2), (2, 5)))
  }

  test("null order values follow Spark SortOrder defaults (desc → nulls last)") {
    val df = Seq(("a", Some(5)), ("a", None), ("a", Some(7)), ("a", Some(1)))
      .toDF("g", "v")
    val ord = Seq(col("v").desc)
    val ours = TopK.perKey(df, Seq("g"), ord, 2)
      .orderBy(col("v").desc).as[(String, Option[Int])].collect()
    val ref = windowForm(df, "g", ord, 2)
      .orderBy(col("v").desc).as[(String, Option[Int])].collect()
    assert(ours.toSeq == ref.toSeq)
    assert(ours.map(_._2).toSeq == Seq(Some(7), Some(5)))
  }

  test("plan is partial heap → one exchange → final heap, no sort of the input") {
    val df = (1 to 1000).map(i => (i % 7, i)).toDF("g", "v")
    val out = TopK.perKey(df, Seq("g"), Seq(col("v").desc), 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKeyFinal"), plan)
    assert(plan.contains("GraftTopKPerKeyPartial"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    // The whole point: no full sort of the child anywhere in the plan.
    assert(!plan.contains("Sort "), plan)
    // Partial bound: the exchange moves ≤ k × keys × input-partitions rows.
    val moved = out.count()
    assert(moved == 21, s"7 keys × k=3 expected, got $moved")
  }

  test("multi-column keys group on the tuple") {
    val df = Seq(("a", 1, 10), ("a", 1, 20), ("a", 2, 30), ("b", 1, 40))
      .toDF("k1", "k2", "v")
    val out = TopK.perKey(df, Seq("k1", "k2"), Seq(col("v").desc), 1)
      .orderBy("k1", "k2").as[(String, Int, Int)].collect()
    assert(out.toSeq == Seq(("a", 1, 20), ("a", 2, 30), ("b", 1, 40)))
  }

  test("unknown column name raises an actionable error") {
    val df = Seq(("a", 1)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      TopK.perKey(df, Seq("nope"), Seq(col("v").desc), 1)
    }
    assert(e.getMessage.contains("nope") && e.getMessage.contains("g, v"))
  }

  test("text-pipeline queries route their top-k through the heap plan, not a window") {
    // q_ngram_topk and q_tfidf_topk exist to show the bounded-exchange
    // shape on corpus-sized key spaces — if a refactor silently falls back
    // to row_number the queries still pass the oracle but lose the 100 TB
    // story, so the physical plan is pinned here.
    for (name <- Seq("q_ngram_topk", "q_tfidf_topk")) {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GraftTopKPerKeyFinal"), s"$name: $plan")
      assert(plan.contains("GraftTopKPerKeyPartial"), s"$name: $plan")
      assert(!plan.contains("Window"), s"$name must not window-sort: $plan")
    }
  }

  test("quality-rule gate is a single scan with no exchange") {
    val df = graft.llm.TextOps.qualityRules(
      graft.query.Tables(spark, "/root/testdata/sf0.001", "documents"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gate must be shuffle-free: $plan")
  }

  test("extensions-installed session plans the operator too") {
    // The strategy is injected by GraftExtensions for cluster deployments;
    // the library path installs it idempotently per session — installing
    // twice must not duplicate work.
    val df = Seq(("a", 1), ("a", 2)).toDF("g", "v")
    val once = TopK.perKey(df, Seq("g"), Seq(col("v").desc), 1)
    val twice = TopK.perKey(df, Seq("g"), Seq(col("v").desc), 1)
    assert(once.as[(String, Int)].collect().toSeq == Seq(("a", 2)))
    assert(twice.as[(String, Int)].collect().toSeq == Seq(("a", 2)))
  }
}
