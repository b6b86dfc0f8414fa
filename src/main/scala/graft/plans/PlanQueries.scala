package graft.plans

import org.apache.spark.sql.functions._
import graft.Q
import graft.query.Tables

/** Driver-verifiable queries for the custom whole-operator plans. */
object PlanQueries {

  val all: Seq[Q] = Seq(
    // Top-3 orders per priority class by price. The oracle is the window
    // form (row_number ≤ k) — hash-equality proves the heap operator
    // computes exactly the window semantics while moving only k rows per
    // key per map partition through the shuffle. Tiebreak on o_orderkey
    // makes the result set unique, so the comparison can't flake.
    Q("q_topk_per_key", Some(
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin),
      (s, d) => {
        val o = Tables(s, d, "orders")
          .select("o_orderpriority", "o_orderkey", "o_totalprice")
        TopK.perKey(o, Seq("o_orderpriority"),
            Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
          .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
      })
  )
}
