package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Q
import Tables.cnt

/** Iterative graph analytics over edge frames (SURVEY.md §2.11 G1).
  *
  * The dedup stack already runs one graph algorithm (pointer-doubling
  * connected components, `VectorOps.dedupClusters`); this adds the other
  * canonical iterate-until-k message-passing shape — weighted PageRank —
  * as a generic operator over (src, dst, w) edge frames. In the
  * reference's domain this ranks repositories by weighted activity flow
  * ("popular repositories from recent activity", `gha.ipynb:395`, beyond
  * raw counts); in a curation pipeline it is reference-rank over a
  * citation/link graph, the classic quality prior.
  *
  * Scale shape per iteration: ranks join edges on src (sort-merge/AQE;
  * both sides shuffle on the SAME key every round, so exchange reuse
  * keeps the edge side's shuffle files warm across iterations), then one
  * hash aggregate by dst whose map-side partials bound the exchange at
  * distinct-dst x partitions rows. Nothing ever collects to the driver —
  * ranks live as a frame (node count rows), exactly the GraphX/Pregel
  * data layout without the RDD API.
  *
  * Cross-engine determinism (the oracle contract): ranks are carried as
  * INTEGERS scaled by 10^14 — each per-edge contribution is computed in
  * DOUBLE (IEEE ops are bit-identical in any engine given identical
  * operand order), `round()`ed to a whole scaled unit (both engines round
  * half away from zero), and summed as int64, which is exact and
  * order-independent. A double sum would vary with partition-dependent
  * summation order, and decimal QUANTIZATION is engine-specific (DuckDB
  * casts double->decimal through a float multiply, Spark through the
  * exact binary expansion — they disagree by one last-place quantum often
  * enough to break an 8-round fixpoint; integer round() after an
  * identical float expression cannot). That makes 8 iterations of float
  * arithmetic hash-comparable across Spark and DuckDB — `sumMoney`'s
  * fixed-point trick applied to message passing. Headroom: total mass is
  * ~10^14 scaled units, ~2^47 — per-dst sums stay far inside int64.
  */
object Graph {

  /** Fixed-point scale for rank mass: 14 decimal digits. */
  private val SCALE = 1e14

  /** Weighted PageRank. `edges`: (src, dst, w: numeric weight > 0);
    * `nodes`: (node) — every rankable vertex, including sinks with no
    * out-edges (their mass leaks, the standard simple formulation).
    * Returns (node, rank: BIGINT scaled by 10^14 — divide by 1e14 for the
    * [0,1] rank) after `iters` rounds of
    * r(v) = (1-damping)/N + damping * sum_{u->v} w(u,v)/outw(u) * r(u).
    *
    * `nNodes` is the caller-supplied vertex count when known a priori
    * (avoids a count job); pass None to have it counted.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
      damping: Double = 0.85, nNodes: Option[Long] = None): DataFrame = {
    require(iters >= 1, "pageRank needs >=1 iteration")
    val n = nNodes.getOrElse(nodes.count())
    require(n > 0, "pageRank over an empty vertex set")
    // outw once, stapled to each edge; snapped so the 8-iteration
    // lazy plan re-reads blocks instead of re-running the join per round
    // (mode knob: [[graft.plans.Snap]])
    val outw = edges.groupBy("src").agg(sum("w").as("outw"))
    val e = graft.plans.Snap.snap(edges.join(outw, "src")
      .select("src", "dst", "w", "outw"))
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    try {
      val teleport = lit(math.round((1.0 - damping) / n * SCALE))
      // LAZY checkpoint per round (the dedupClusters pattern): lineage
      // truncates every iteration — the plan never grows to iters-deep
      // join nesting — while materialization cascades once, at the final
      // eager checkpoint, instead of paying a scheduler round-trip per
      // round. Superseded rounds' blocks release deterministically below.
      var ranks = nodes
        .select(col("node"), lit(math.round(1.0 / n * SCALE)).as("rank"))
        .localCheckpoint(eager = false)
      val rounds = scala.collection.mutable.ArrayBuffer(ranks)
      for (_ <- 1 to iters) {
        val contribs = e.join(ranks.select(col("node"), col("rank")),
            e("src") === col("node"))
          .select(col("dst"),
            round(lit(damping) * col("rank").cast("double") * col("w") / col("outw"))
              .cast("long").as("c"))
          .groupBy("dst").agg(sum("c").as("m"))
        ranks = nodes.join(contribs, nodes("node") === contribs("dst"), "left")
          .select(col("node"),
            (teleport + coalesce(col("m"), lit(0L))).as("rank"))
          .localCheckpoint(eager = false)
        rounds += ranks
      }
      val out = ranks.localCheckpoint() // eager: one job materializes the chain
      rounds.foreach(bridge.releaseLocalCheckpoint) // out is independent of them
      out
    } finally {
      graft.plans.Snap.release(e)
    }
  }

  /** The DuckDB twin of one pageRank run, unrolled (recursive CTEs forbid
    * aggregation in the recursive term, so the iterations chain as CTEs).
    */
  private def pageRankSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    CAST(round(CAST(0.15 AS DOUBLE) / 25 * 1e14) AS BIGINT) +
         |      coalesce(s.m, 0) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, CAST(sum(CAST(round(CAST(0.85 AS DOUBLE)
         |        * CAST(r.rank AS DOUBLE) * e.w / e.outw) AS BIGINT)) AS BIGINT) AS m
         |    FROM e JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst
         |  ) s ON n.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1, 2),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY 1),
       |e AS (SELECT edges.src, dst, w, outw FROM edges JOIN outw ON edges.src = outw.src),
       |nodes AS (SELECT n_nationkey AS node FROM nation),
       |r0 AS (SELECT node, CAST(round(CAST(1.0 AS DOUBLE) / 25 * 1e14) AS BIGINT) AS rank
       |       FROM nodes),
       |$steps
       |SELECT node, CAST(rank AS DOUBLE) / 1e14 AS rank FROM r$iters ORDER BY node""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // ---- G1: PageRank over the nation trade graph ------------------------------
    // Edge extraction is the 100 TB part: lineitem x orders x customer x
    // supplier folded to (customer-nation -> supplier-nation, shipment
    // count) — the graph "who buys from whom, how much". 8 rank rounds
    // then run on the aggregated edges. Hash equality across 8 rounds of
    // message passing pins the decimal-quantized float contract above.
    Q("q_pagerank", Some(pageRankSql(8)),
      (s, d) => {
        val li = Tables(s, d, "lineitem").select("l_orderkey", "l_suppkey")
        val o = Tables(s, d, "orders").select("o_orderkey", "o_custkey")
        val c = Tables(s, d, "customer").select("c_custkey", "c_nationkey")
        val su = Tables(s, d, "supplier").select("s_suppkey", "s_nationkey")
        val edges = li
          .join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, li("l_suppkey") === su("s_suppkey"))
          .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
          .agg(cnt.as("w"))
        val nodes = Tables(s, d, "nation")
          .select(col("n_nationkey").as("node"))
        pageRank(edges, nodes, iters = 8, nNodes = Some(25))
          .select(col("node"), (col("rank").cast("double") / lit(1e14)).as("rank"))
          .orderBy("node")
      }),

    // ---- G2: degree-oriented triangle counting --------------------------------
    // Graph: parts co-occurring in the same order (10% deterministic order
    // sample bounds the edge build). The algorithm is the one that
    // survives scale: orient every undirected edge from the lower to the
    // higher endpoint under the (degree, id) total order, then count
    // lo→mid→hi wedge closures. Orientation caps out-degree at O(√m), so
    // the wedge join is Σ outdeg² = O(m^1.5) instead of Σ deg² — the
    // difference between a skewed hub exploding the join and not. Three
    // hash-joins on int keys, no driver state; the clustering coefficient
    // is a ratio of two exact int64 counts (bit-identical across engines).
    Q("q_triangles", Some(
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  WHERE a.l_orderkey % 10 = 0),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs)
        |  GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
        |              THEN u ELSE v END AS lo,
        |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
        |              THEN v ELSE u END AS hi
        |  FROM pairs JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
        |tri AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM o e1 JOIN o e2 ON e2.lo = e1.hi
        |  JOIN o e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
        |wedge AS (SELECT CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS w,
        |                 CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
        |SELECT wedge.n_nodes,
        |  (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
        |  tri.n_triangles,
        |  round(3.0 * tri.n_triangles / wedge.w, 6) AS clustering
        |FROM tri, wedge""".stripMargin),
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .filter(col("l_orderkey") % 10 === 0)
          .select("l_orderkey", "l_partkey")
        val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
        val b = li.select(col("l_orderkey").as("ok_b"), col("l_partkey").as("v"))
        val pairs = a.join(b,
            col("l_orderkey") === col("ok_b") && col("u") < col("v"))
          .select("u", "v").distinct()
        triangleStats(pairs)
      }),

    // ---- G3: label propagation communities ------------------------------------
    // The oracle unrolls the SAME two synchronous rounds in SQL (per-node
    // neighbor-label vote, argmax by votes desc / label asc) — hash
    // equality proves the iterative frame loop computes the textbook
    // update exactly, tie policy included. Two rounds keeps the unrolled
    // twin honest while exercising a genuine label HANDOFF (round 2 votes
    // with round 1's labels, not ids).
    Q("q_label_prop", Some(
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  WHERE a.l_orderkey % 10 = 0),
        |e AS (SELECT u AS src, v AS dst FROM pairs
        |      UNION ALL SELECT v, u FROM pairs),
        |c1 AS (SELECT dst AS node, src AS label, count(*) AS votes
        |       FROM e GROUP BY 1, 2),
        |l1 AS (SELECT node, label FROM (
        |  SELECT node, label, row_number() OVER (
        |    PARTITION BY node ORDER BY votes DESC, label) AS rn FROM c1)
        |  WHERE rn = 1),
        |c2 AS (SELECT e.dst AS node, l1.label, count(*) AS votes
        |       FROM e JOIN l1 ON l1.node = e.src GROUP BY 1, 2),
        |l2 AS (SELECT node, label FROM (
        |  SELECT node, label, row_number() OVER (
        |    PARTITION BY node ORDER BY votes DESC, label) AS rn FROM c2)
        |  WHERE rn = 1)
        |SELECT node, label AS community FROM l2 ORDER BY node""".stripMargin),
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .filter(col("l_orderkey") % 10 === 0)
          .select("l_orderkey", "l_partkey")
        val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
        val b = li.select(col("l_orderkey").as("ok_b"), col("l_partkey").as("v"))
        val pairs = a.join(b,
            col("l_orderkey") === col("ok_b") && col("u") < col("v"))
          .select("u", "v").distinct()
        labelPropagation(pairs, rounds = 2)
          .select(col("node"), col("label").as("community"))
          .orderBy("node")
      })
  )

  /** Degree-oriented triangle count + global clustering coefficient over an
    * undirected edge frame `pairs` (u < v, distinct). See q_triangles for
    * the O(√m) out-degree bound the orientation buys.
    */
  def triangleStats(pairs0: DataFrame): DataFrame = {
    val snap = graft.plans.Snap
    // the lazy tree reads `pairs` six times and the oriented edge set
    // three times; unsnapped, the edge-build join re-executes under every
    // consumer (the r11 before-plan carried 36 lineitem scans / 58
    // Exchanges for ONE triangle count). Snap each shared frame once —
    // edges, degrees, oriented edges are all O(m) — and every consumer
    // reads blocks. The wedge join itself is unchanged (that is the
    // algorithm's cost). NOTE: `pairs` is O(dataset) — on an elastic
    // cluster run this path under `spark.graft.snapMode=persist` (or
    // `reliable`), the executor-loss-safe modes ([[graft.plans.Snap]]);
    // the `local` default is the static-executor / local[*] contract.
    val pairs = snap.snap(pairs0)
    try {
      val deg = snap.snap(pairs.select(col("u").as("node"))
        .unionAll(pairs.select(col("v").as("node")))
        .groupBy("node").agg(cnt.as("deg"))
      ) // read by du, dv and the wedge aggregate
      try {
        val du = deg.select(col("node").as("u"), col("deg").as("du"))
        val dv = deg.select(col("node").as("v"), col("deg").as("dv"))
        val lower = col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v"))
        val o = snap.snap(pairs.join(du, "u").join(dv, "v")
          .select(when(lower, col("u")).otherwise(col("v")).as("lo"),
            when(lower, col("v")).otherwise(col("u")).as("hi"))
        ) // read by e1, e2 and the closing join
        try {
          val e1 = o.select(col("lo").as("lo1"), col("hi").as("hi1"))
          val e2 = o.select(col("lo").as("lo2"), col("hi").as("hi2"))
          val wedges = e1.join(e2, col("lo2") === col("hi1"))
          val tri = wedges.join(o,
              col("lo") === col("lo1") && col("hi") === col("hi2"))
            .agg(cnt.as("n_triangles"))
          val wedge = deg.agg(
            (sum(col("deg") * (col("deg") - 1)) / 2).cast("long").as("w"),
            cnt.as("n_nodes"))
          val nEdges = pairs.agg(cnt.as("n_edges"))
          snap.snap(tri.crossJoin(wedge).crossJoin(nEdges)
            .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
              // a wedge-free graph (perfect matching) has w=0: clustering is
              // undefined → null, not a div-by-zero (ANSI mode would throw)
              when(col("w") > 0,
                round(lit(3.0) * col("n_triangles") / col("w"), 6))
                .as("clustering"))
          ) // one row; lets the O(m) snaps release
        } finally { snap.release(o) }
      } finally { snap.release(deg) }
    } finally { snap.release(pairs) }
  }

  /** G3: synchronous label propagation over an undirected edge frame
    * (u < v, distinct) — community detection by neighbor-majority vote
    * (Raghavan et al. 2007), the denser-than-connectivity grouping CC
    * cannot express (CC merges everything reachable; LP stops where the
    * vote flips, so sparse bridges between dense groups don't merge
    * them). Labels start as node ids; each SYNCHRONOUS round relabels
    * every node to the most frequent label among its neighbors, ties to
    * the LOWEST label — fully deterministic, unlike the classic
    * async/random-order formulation, and therefore oracle-checkable
    * round for round (the DuckDB twin unrolls the same rounds).
    *
    * Scale shape per round: one join of labels onto edges (both sides
    * shuffle on the node key every round — exchange reuse keeps the edge
    * side warm, the [[pageRank]] layout) + one (node, label) hash
    * aggregate + one argmax-per-node via the bounded heap plan
    * ([[graft.plans.TopK]] — never a global sort). Labels live as a
    * frame; nothing collects.
    */
  def labelPropagation(pairs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need >= 1 round, got $rounds")
    // the union's two legs share the caller's pair-build exchange via
    // ReuseExchange (measured: an extra pairs-level snap REGRESSED the
    // build 1.36 -> 1.68 s — the eager materialization pass cost more
    // than the reuse it chased); only the round-scanned edge frame snaps
    val e = graft.plans.Snap.snap(
      pairs.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(pairs.select(col("v").as("src"), col("u").as("dst")))
    ) // scanned every round; snap once (mode knob: graft.plans.Snap)
    try {
      var labels = e.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      for (_ <- 1 to rounds) {
        val votes = e.join(labels, e("src") === labels("node"))
          .groupBy(col("dst").as("n"), col("label")).agg(cnt.as("votes"))
        labels = graft.plans.TopK.perKey(votes, Seq("n"),
          Seq(col("votes").desc, col("label").asc), 1)
          .select(col("n").as("node"), col("label"))
      }
      graft.plans.Snap.snap(labels) // node-count rows; lets the edge snap go
    } finally {
      graft.plans.Snap.release(e)
    }
  }
}
