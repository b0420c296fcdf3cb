package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** House-wide "compute once, read many times" materialization for the
  * multi-consumer intermediate relations (shingle/bigram/signature/token
  * tables) that several downstream branches read.
  *
  * The tradeoff the `reliable` knob controls, stated once here and
  * referenced by every operator that exposes it:
  *
  *  - `reliable = false` (default): non-eager `localCheckpoint`. Blocks
  *    are stored executor-local with TRUNCATED lineage — the cheapest way
  *    to stop Catalyst's separately-pruned subplans from re-scanning and
  *    re-deriving the corpus per consumer (plain `.cache()` does not help
  *    for self-join shapes: attribute dedup defeats the cache lookup).
  *    The cost: losing an executor mid-job fails the job, because there is
  *    no recompute path. Right for single-node runs and short jobs.
  *  - `reliable = true`: replicated persist (MEMORY_AND_DISK_2). Every
  *    block lives on two executors, so the job survives a single executor
  *    loss, at the cost of 2× storage traffic and memory/disk footprint.
  *    Right for long cluster runs where executor loss is expected —
  *    at 1000 executors some loss is routine, and an hours-long curation
  *    pass should not restart because one machine went away.
  *
  * Lifetime differs by path: localCheckpoint blocks are freed by the
  * ContextCleaner when the frame becomes unreferenced, but `persist`
  * entries are pinned in Spark's CacheManager until explicitly
  * unpersisted — iterative callers on the reliable path MUST call
  * [[release]] on each round's frame once its successor is materialized,
  * or replicated storage grows by one corpus-sized relation per round.
  */
private[graft] object Materialize {
  /** `eager` forces materialization NOW (iterative callers — label
    * propagation, per-batch survivor reuse — want the blocks pinned before
    * the frame is consumed twice); the default stays lazy so linear
    * pipelines pay nothing until first use. `persist` is lazy too, so the
    * reliable path pays one explicit count to honor `eager` — without it
    * the flag would be a silent no-op there.
    */
  def once(df: DataFrame, reliable: Boolean, eager: Boolean = false): DataFrame =
    if (reliable) {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK_2)
      if (eager) p.count()
      p
    } else df.localCheckpoint(eager = eager)

  /** Free the blocks pinned by [[once]] — reliable path only. Persist
    * entries are NOT freed by the ContextCleaner (CacheManager pins them
    * for the session), so iterative jobs must release superseded rounds
    * explicitly. The localCheckpoint path is deliberately a no-op:
    * its lineage is truncated, so unpersisting would destroy the only
    * copy of the data; the ContextCleaner reclaims those blocks when the
    * frame is garbage-collected.
    */
  def release(df: DataFrame, reliable: Boolean): Unit =
    if (reliable) df.unpersist(blocking = false)
}
