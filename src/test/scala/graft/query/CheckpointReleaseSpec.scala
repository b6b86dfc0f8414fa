package graft.query

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.ColumnBridge
import graft.SparkFixture

/** Pins the deterministic-release contract for localCheckpoint'd frames:
  * checkpoint blocks are NOT freed by clearCache, so per-invocation
  * snapshots (contamination shingle frames, CC round states) must drop
  * their blocks explicitly instead of waiting for driver GC.
  *
  * Assertions are keyed by the frames' OWN checkpoint-RDD ids where
  * possible; the loop test diffs the global persistent set, which is safe
  * because forked suites run sequentially (Test/fork without
  * testForkedParallel) — flip that setting and this suite needs a lock.
  */
class CheckpointReleaseSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def checkpointRddIds(df: DataFrame): Set[Int] =
    ColumnBridge.analyzed(df).collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet

  test("releaseLocalCheckpoint drops the snapshot's storage registration") {
    val df = (1 to 1000).toDF("n").localCheckpoint()
    assert(df.count() === 1000)
    val ids = checkpointRddIds(df)
    assert(ids.nonEmpty, "localCheckpoint should put a LogicalRDD in the plan")
    assert(ids.subsetOf(persistentIds),
      "an eager localCheckpoint registers its RDD as persistent")
    ColumnBridge.releaseLocalCheckpoint(df)
    assert(ids.intersect(persistentIds).isEmpty,
      "release must unregister the checkpoint's persistent RDD")
  }

  test("release rejects plain and derived frames (would release OTHER live inputs)") {
    // a non-checkpointed frame: caller bug, nothing to release
    intercept[IllegalArgumentException] {
      ColumnBridge.releaseLocalCheckpoint((1 to 10).toDF("n"))
    }
    // a frame DERIVED from checkpoints: its plan embeds two live
    // checkpointed inputs; a tree-wide unpersist would silently make both
    // unrecomputable, so the strict root-only contract must refuse it
    val a = (1 to 100).toDF("n").localCheckpoint()
    val b = (50 to 150).toDF("n").localCheckpoint()
    val joined = a.join(b, "n")
    intercept[IllegalArgumentException] {
      ColumnBridge.releaseLocalCheckpoint(joined)
    }
    // both inputs are still live and recomputable
    assert(joined.count() === 51)
    assert(checkpointRddIds(a).subsetOf(persistentIds))
    assert(checkpointRddIds(b).subsetOf(persistentIds))
    ColumnBridge.releaseLocalCheckpoint(a)
    ColumnBridge.releaseLocalCheckpoint(b)
  }

  test("dedupClusters retains only the final labels snapshot") {
    // a 12-node chain forces several pointer-doubling rounds; without the
    // in-loop release each round would leave its own persistent RDD behind
    val before = persistentIds
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = graft.llm.TextOps.dedupClusters(pairs)
    assert(out.filter($"cluster_id" === 1L).count() === 12)
    val outIds = checkpointRddIds(out)
    assert(outIds.size === 1, "the result references exactly the final labels")
    assert((persistentIds -- before) === outIds,
      "superseded round states and the edge caches must all be released")
  }
}
