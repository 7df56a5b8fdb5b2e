package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release valve for eager `localCheckpoint` iteration frames.
  *
  * `Dataset.localCheckpoint()` persists its materialized blocks on the
  * raw RDD, OUTSIDE the SQL `CacheManager` — so `Dataset.unpersist()`
  * cannot release them, and nothing does until the `ContextCleaner`
  * happens to GC the frame. In an iterative operator that chains one
  * checkpoint per round (PageRank, HITS, k-core, k-means, CC) the
  * superseded rounds' |V|-row block sets therefore pile up for the
  * whole job: harmless on a laptop, a steady executor-storage leak at
  * 100 TB, and the root cause of the round-13 `sbt test` flake (a
  * later suite asserting on the shared context's persistent-RDD
  * registry saw whichever frames GC had not yet collected).
  *
  * The fix is direct: the checkpointed Dataset's plan is a flat
  * [[LogicalRDD]] over exactly the persisted RDD, so once iteration
  * t's successor has materialized its OWN blocks (localCheckpoint is
  * eager), unpersisting iteration t-1's RDD is safe — no consumer can
  * reach it again — and free of the `CacheManager` re-cache cascade
  * that makes `Dataset.unpersist()` chains recompute (the measured 5×
  * on HITS documented in [[Graph]]).
  *
  * NEVER call this on a frame that is still reachable: a
  * locally-checkpointed RDD has no lineage to recompute from, so a
  * post-release access fails with a missing-block error rather than
  * silently recomputing.
  */
object Checkpoints {

  /** Unpersist the localCheckpoint blocks backing `df` (no-op for null
    * or non-checkpointed frames). Call only after every consumer of
    * `df` has materialized. */
  def release(df: DataFrame): Unit =
    if (df != null) df.queryExecution.logical.collect {
      case r: LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))
}
