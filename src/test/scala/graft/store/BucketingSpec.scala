package graft.store

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Co-located joins via bucketing (the brief's "repartition()/bucketing for
  * co-located joins"): both sides bucketed on the join key at write time →
  * the sort-merge join runs with NO Exchange on either side. At 100 TB this
  * converts every fact⋈fact join on the bucket key from a full shuffle to
  * a local merge per bucket.
  */
class BucketingSpec extends AnyFunSuite with SparkFixture {

  test("join on the bucket key plans without a shuffle on either side") {
    // warehouse.dir is a static conf — bucketed tables land in the default
    // ./spark-warehouse; purge catalog entries AND any orphaned dirs from a
    // previously interrupted run before writing
    for (t <- Seq("li_b", "ord_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t PURGE")
      val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val ord = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_b")

    // hint pins the shuffle-join path (sf0.001 is under the auto-broadcast
    // threshold; at real scale both sides are facts and merge is the plan)
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    // the join itself must read bucketed data directly: no Exchange between
    // the scans and the join (the only allowed Exchange is the final
    // aggregation's, which groups on a different key)
    val joinSection = plan.substring(0, plan.length)
    val exchangesBeforeJoin = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findAllIn(joinSection).size
    assert(exchangesBeforeJoin === 0,
      s"bucketed join should not shuffle on the join key:\n$plan")
    // correctness unchanged
    assert(joined.agg(sum("count")).head().getLong(0) === li.count())

    spark.sql("DROP TABLE IF EXISTS li_b PURGE")
    spark.sql("DROP TABLE IF EXISTS ord_b PURGE")
  }
}
