package graft.util

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of `localCheckpoint` storage.
  *
  * `Dataset.unpersist` only touches cache-manager entries; the blocks
  * behind a localCheckpoint'ed Dataset are plain RDD caches that
  * otherwise wait for driver GC + ContextCleaner to be reclaimed. Loops
  * that re-checkpoint state every iteration (the crawl round loop's
  * frontier / seen set / Bloom shards) would pin every superseded
  * iteration's blocks for a nondeterministic time inside the measured
  * window — release them eagerly instead.
  */
object Checkpoints {

  /** Unpersist the RDDs backing a localCheckpoint'ed Dataset. No-op for
    * plans without a checkpoint (e.g. parquet-backed snapshot reads). */
  def release(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case r: LogicalRDD => r.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
