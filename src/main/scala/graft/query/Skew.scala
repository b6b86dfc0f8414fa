package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Q
import Tables.cnt

/** Skew mitigation (SURVEY.md §7.5 / the 100 TB design stance): salted
  * joins for hot keys, complementing AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.enabled=true` everywhere in this engine).
  *
  * AQE handles skew it can see (post-shuffle partition sizes); explicit
  * salting is the planned-ahead form for *known* hot keys — e.g. the
  * reference's workload has mega-repos (a `torvalds/linux` hour dwarfs the
  * median repo) where a per-repo shuffle would hotspot one task.
  */
object Skew {

  /** Inner equi-join with the big side salted into `buckets` sub-keys and
    * the small side replicated once per bucket. Row-level semantics are
    * identical to `big.join(small, key)`; only the shuffle distribution
    * changes: the hot key's rows spread over `buckets` tasks instead of
    * one.
    *
    * The salt is derived from a uniform row attribute (`saltSource`), not
    * `rand()`, so runs are deterministic and re-runs idempotent.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, saltSource: Column): DataFrame = {
    require(buckets > 0)
    val salted = big.withColumn("_salt", pmod(xxhash64(saltSource), lit(buckets)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }

  val all: Seq[Q] = Seq(
    // Salting is a distribution strategy, not a semantics change — so the
    // oracle is the PLAIN join SQL; hash-equality against it proves the
    // rewrite preserves the result set exactly.
    Q("q_join_salted", Some(
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .withColumnRenamed("l_orderkey", "orderkey")
        val ord = Tables(s, d, "orders")
          .withColumnRenamed("o_orderkey", "orderkey")
        // buckets=4 spreads a hot key over 4 tasks while only 4x-replicating
        // the dim side — the demo's point survives at half the round-2 cost
        // (8x); production callers size buckets to the observed hot-key skew.
        saltedJoin(li, ord, "orderkey", buckets = 4,
          saltSource = col("l_linenumber"))
          .groupBy("o_orderpriority")
          .agg(cnt.as("cnt"), Tables.sumMoney(col("l_quantity")).as("sum_qty"))
          .orderBy("o_orderpriority")
      })
  )
}
