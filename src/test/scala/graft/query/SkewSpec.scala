package graft.query

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class SkewSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def big = Seq.tabulate(100)(i =>
    (if (i < 90) "hot" else s"k$i", i.toLong)).toDF("key", "row_id")
  private def small = Seq(("hot", 1L), ("k95", 2L), ("absent", 3L))
    .toDF("key", "dim_id")

  test("saltedJoin row set equals the plain join (semantics preserved)") {
    val plain = big.join(small, Seq("key"), "inner")
      .select("key", "row_id", "dim_id").as[(String, Long, Long)]
      .collect().toSet
    val salted = Skew.saltedJoin(big, small, "key", 8, col("row_id"))
      .select("key", "row_id", "dim_id").as[(String, Long, Long)]
      .collect().toSet
    assert(salted === plain)
    assert(salted.size === 91) // 90 hot + k95
  }

  test("saltedJoin spreads a hot key over multiple shuffle partitions") {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col("row_id")), lit(8)))
    val saltCount = salted.filter($"key" === "hot")
      .select("_salt").distinct().count()
    assert(saltCount > 4, s"salt only hit $saltCount buckets of 8")
  }

  test("buckets=1 degenerates to the plain join") {
    val salted = Skew.saltedJoin(big, small, "key", 1, col("row_id"))
    assert(salted.count() === 91)
  }

  test("AQE splits a skewed sort-merge join at runtime (the salting-free path)") {
    // SURVEY §4 claims runtime skew handling is AQE's job when the skew is
    // not known in advance (saltedJoin is the planned-ahead form). Pin the
    // claim: a join with one dominating key, forced to sort-merge, must
    // come out of adaptive execution with its skewed partition split —
    // Spark marks the join `skew=true` in the final plan.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val hot = Seq.tabulate(40000)(i =>
        (if (i % 20 == 0) s"k${i % 97}" else "hot",
          s"payload-$i-${"x" * 48}")).toDF("key", "payload")
      val dim = Seq.tabulate(97)(i => (s"k$i", i.toLong))
        .union(Seq(("hot", -1L))).toDF("key", "dim_id")
      val joined = hot.join(dim, Seq("key"))
      // execute THIS dataset (count() would plan a different query and the
      // adaptive state under inspection would stay unexecuted)
      assert(joined.collect().length === 40000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew-split in the adaptive final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
