package graft.plans

import org.apache.spark.sql.DataFrame

/** Size-adaptive build-side strategy for candidate re-attach joins.
  *
  * The shape: a bucketed/LSH pipeline emits a large (id, id) candidate
  * stream and re-joins payloads (signatures, vectors, shingle sets). The
  * round-8 ×100 probe proved the re-attach must NEVER plan as sort-merge —
  * SMJ sorts the fan-out side (312M widened candidate rows spilled ~170 GB
  * and filled the disk) — so every site pinned `hint("shuffle_hash")`.
  * That insurance is free at 100 TB but not at fixture scale: the hint
  * also blocks the broadcast AQE used to pick when the build side is a few
  * MB, forcing a full exchange of the candidate stream (the round-8 suite
  * shuffle tripled 147→478 MB; the round-9 A/B measured +5–20% on the LSH
  * keys against the r7-close commit on the same box).
  *
  * This helper restores the broadcast regime EXACTLY when it is provable:
  * callers invoke it AFTER the build side is materialized (persist+count
  * or localCheckpoint — every verify pipeline already does this for its
  * own barrier reasons), so `optimizedPlan.stats.sizeInBytes` is the REAL
  * cached size, not a heuristic. Under the session broadcast threshold →
  * `broadcast` (candidates never exchange at all); above it, or when
  * broadcasting is disabled (threshold <= 0), or when the frame is NOT
  * materialized and the estimate is therefore a heuristic → the
  * `shuffle_hash` floor. Sort-merge is unreachable either way, which is
  * what FanoutSortLintSpec gates.
  */
object Reattach {

  /** `build.hint("broadcast")` iff `build`'s optimized-plan size — real
    * when the frame is cached/checkpointed — is within the session's
    * `autoBroadcastJoinThreshold`; else `build.hint("shuffle_hash")`.
    */
  def adaptive(build: DataFrame): DataFrame = {
    val est = build.queryExecution.optimizedPlan.stats.sizeInBytes
    val thr = build.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thr > 0 && est >= 0 && est <= thr) build.hint("broadcast")
    else build.hint("shuffle_hash")
  }

  /** The ×100-safe fixed strategy — what the lazy plan builders use so
    * the FanoutSortLint keeps asserting the shuffle-hash floor.
    */
  def shuffleHash(build: DataFrame): DataFrame = build.hint("shuffle_hash")
}
