package graft.query

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.ColumnBridge
import graft.SparkFixture

/** Pins the deterministic-release contract for localCheckpoint'd frames:
  * checkpoint blocks are NOT freed by clearCache, so per-invocation
  * snapshots (contamination shingle frames, CC round states) must drop
  * their blocks explicitly instead of waiting for driver GC.
  */
class CheckpointReleaseSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def checkpointedRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("releaseLocalCheckpoint drops the snapshot's storage registration") {
    val before = checkpointedRddIds
    val df = (1 to 1000).toDF("n").localCheckpoint()
    assert(df.count() === 1000)
    val added = checkpointedRddIds -- before
    assert(added.nonEmpty, "localCheckpoint should register a persistent RDD")
    ColumnBridge.releaseLocalCheckpoint(df)
    assert((checkpointedRddIds -- before).isEmpty,
      "release must unregister the checkpoint's persistent RDD")
  }

  test("release is a no-op on a plain (non-checkpointed) frame") {
    val before = checkpointedRddIds
    val df = (1 to 10).toDF("n")
    ColumnBridge.releaseLocalCheckpoint(df)
    assert(df.count() === 10)
    assert(checkpointedRddIds === before)
  }

  test("dedupClusters leaves no persistent round state behind") {
    val before = checkpointedRddIds
    // a 12-node chain forces several pointer-doubling rounds
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = graft.llm.TextOps.dedupClusters(pairs)
    assert(out.filter($"cluster_id" === 1L).count() === 12)
    // superseded round checkpoints are released in-loop; only the FINAL
    // labels snapshot (referenced by the returned frame) may remain
    assert((checkpointedRddIds -- before).size <= 1)
  }
}
