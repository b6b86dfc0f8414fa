package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Runtime bloom-filter join pruning (SURVEY.md §4): when a selective
  * filter sits on the build side of a shuffle join, Catalyst injects a
  * bloom filter built from the filtered keys and applies it to the probe
  * side BEFORE the shuffle — at 100 TB this turns "shuffle the whole fact
  * table, then drop 99% in the join" into "drop 99% at the scan". The
  * engine relies on Spark's own `InjectRuntimeFilter`; this spec pins the
  * configuration contract that keeps it active (it silently disables if
  * thresholds or join shapes drift).
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("selective dim filter injects a bloom filter on the fact side") {
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force the shuffle-join regime the filter exists for (at real scale
      // the dim side exceeds the broadcast threshold on its own) and drop
      // the size floors that assume production-sized inputs
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")

      val fact = spark.range(0, 200000)
        .select(col("id").as("k"), (col("id") % 97).as("v"))
      val dim = spark.range(0, 5000)
        .select(col("id").as("k"), (col("id") % 13).as("cat"))
        .filter(col("cat") === 3) // selective: ~7.7% of dim keys survive
      val joined = fact.join(dim, "k")

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilterMightContain") ||
        optimized.toLowerCase.contains("mightcontain"),
        s"no runtime bloom filter injected:\n$optimized")
      // and it must not have broken the join result: keys k < 5000 with
      // k % 13 == 3 → 385 surviving dim keys, one fact row each
      assert(joined.count() === 385L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
