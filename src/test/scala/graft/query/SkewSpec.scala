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
}
