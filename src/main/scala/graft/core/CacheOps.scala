package graft.core

import org.apache.spark.sql.Dataset

/** Deterministic release for local checkpoints.
  *
  * `Dataset.localCheckpoint(true)` caches the materialized partitions on an
  * RDD the CacheManager never tracks, so `Dataset.unpersist()` is a no-op on
  * it and the blocks linger until the JVM's ContextCleaner happens to notice
  * the RDD is unreachable. The iterative drains (walk generation, repair)
  * take one such checkpoint per hop; across a many-hop drain — or 48 bench
  * queries sharing one JVM — the orphaned slices pile into real storage
  * pressure (the round-4 bench's sporadic >60 s walker reps are consistent
  * with exactly this: eviction + GC churn under a full storage pool).
  *
  * [[checkpointReleasable]] returns the checkpointed Dataset together with a
  * handle that unpersists its underlying RDD NOW. Releasing is safe once
  * every consumer that must survive is itself materialized to a
  * MEMORY_AND_DISK cache (a local checkpoint has no recompute lineage — this
  * is the standard localCheckpoint caveat, not a new one).
  */
object CacheOps {

  def checkpointReleasable[T](ds: Dataset[T]): (Dataset[T], () => Unit) = {
    val cp = ds.localCheckpoint(true)
    val release: () => Unit = cp.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => () => { l.rdd.unpersist(blocking = false); () }
      case _                                            => () => ()
    }
    (cp, release)
  }
}
