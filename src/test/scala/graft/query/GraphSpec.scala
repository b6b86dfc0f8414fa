package graft.query

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** G1 PageRank laws (ranks come back as int64 fixed-point x 1e14). */
class GraphSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)], nodes: Seq[Long],
      iters: Int = 8): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), nodes.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1) / 1e14).toMap

  test("a symmetric clique ranks uniformly") {
    val nodes = Seq(0L, 1L, 2L)
    val edges = for {
      a <- nodes; b <- nodes if a != b
    } yield (a, b, 1L)
    val r = ranks(edges, nodes)
    assert(r.values.toSet.size === 1, s"non-uniform: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("mass conserves when every node has out-edges (sum = 1)") {
    // a 4-node cycle with a chord: no sinks, so no leak
    val nodes = Seq(0L, 1L, 2L, 3L)
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 1L), (3L, 0L, 1L),
      (1L, 3L, 1L))
    val r = ranks(edges, nodes)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"mass leaked: $r")
  }

  test("an authority pointed at by everyone outranks its satellites") {
    val nodes = Seq(0L, 1L, 2L, 3L)
    // 1,2,3 all point at 0; 0 points back at 1 only. The 0<->1 cycle
    // oscillates with period 2 damped by 0.85/round, so this law needs the
    // CONVERGED ranks — 50 rounds (0.85^50 ~ 3e-4), not the 8-round default.
    val edges = Seq((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L), (0L, 1L, 1L))
    val r = ranks(edges, nodes, iters = 50)
    assert(r(0L) > r(1L) && r(1L) > r(2L), s"unexpected order: $r")
    assert(r(2L) === r(3L)) // symmetric satellites tie exactly
  }

  test("edge weights steer rank: heavier edge carries more mass") {
    val nodes = Seq(0L, 1L, 2L)
    // 0 splits mass 3:1 between 1 and 2; 1 and 2 return to 0
    val edges = Seq((0L, 1L, 3L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
    val r = ranks(edges, nodes)
    assert(r(1L) > r(2L), s"weight ignored: $r")
  }

  test("sink nodes leak mass but never rank below teleport") {
    val nodes = Seq(0L, 1L)
    val edges = Seq((0L, 1L, 1L)) // 1 is a sink
    val r = ranks(edges, nodes)
    assert(r.values.sum < 1.0) // leak is the documented simple formulation
    assert(r(0L) >= 0.15 / 2 - 1e-12) // teleport floor
    assert(r(1L) > r(0L))
  }

  test("empty vertex set and zero iterations are rejected") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq((0L, 1L, 1L)).toDF("src", "dst", "w"),
        Seq.empty[Long].toDF("node"), iters = 1)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq((0L, 1L, 1L)).toDF("src", "dst", "w"),
        Seq(0L).toDF("node"), iters = 0)
    }
  }

  private def communities(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    Graph.labelPropagation(pairs.toDF("u", "v"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("label propagation: two cliques joined by one bridge stay TWO " +
    "communities — the density distinction CC cannot make") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val pairs = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((4L, 10L)) // sparse bridge
    val got = communities(pairs, rounds = 4)
    // each clique converges to ONE label, and the two labels differ
    val left = Set(1L, 2L, 3L, 4L).map(got)
    val right = Set(10L, 11L, 12L, 13L).map(got)
    assert(left.size == 1, s"left clique split: $got")
    assert(right.size == 1, s"right clique split: $got")
    assert(left != right, s"bridge merged the cliques: $got")
    // while connected components would put all 8 nodes in ONE cluster
    // (they are all reachable through the bridge) — pin the contrast
    val cc = graft.llm.TextOps.dedupClusters(
      pairs.toDF("id_a", "id_b"))
      .select("cluster_id").distinct().count()
    assert(cc == 1L)
  }

  test("label propagation ties resolve to the LOWEST label (determinism pin)") {
    // node 2 sees one vote each from 1 and 3 (labels 1 and 3) → takes 1
    val got = communities(Seq((1L, 2L), (2L, 3L)), rounds = 1)
    assert(got(2L) == 1L)
    // sync round 1 from id labels: 1 and 3 each see only node 2 → label 2
    assert(got(1L) == 2L && got(3L) == 2L)
  }

  test("label propagation rejects zero rounds") {
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(Seq((1L, 2L)).toDF("u", "v"), rounds = 0)
    }
  }
}
