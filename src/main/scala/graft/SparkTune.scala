package graft

import org.apache.spark.sql.SparkSession

/** Host I/O tuning shared by every entry point's SparkSession.
  *
  * Round-2 diagnosis (BASELINE.md): on this sandbox kernel,
  * `FileChannel.transferTo` falls back to its mmap-copy path and
  * Spark's DiskStore memory-maps any disk block over 2 MiB. Both put
  * every shuffle-file concatenation and spilled-cache read through
  * mmap/munmap syscalls, and all task threads of a local-mode JVM
  * share one process mmap lock — contention grows superlinearly with
  * core count (local[32] collapsed to ~150 urls/s in big crawl rounds
  * while local[8] barely noticed; jstack showed all 32 workers inside
  * FileChannelImpl.map0). Streamed copies make both paths lock-free:
  *
  *  - `spark.file.transferTo=false` — BypassMergeSortShuffleWriter
  *    concatenates partition files through plain buffered streams.
  *  - `spark.storage.memoryMapThreshold=2g` — DiskStore reads spilled
  *    blocks through a stream instead of mmap.
  *  - `spark.shuffle.file.buffer=1m` — fewer write syscalls per
  *    shuffle file at a negligible memory cost per active writer.
  *
  * On a real multi-executor cluster the same settings are per-executor
  * conf; with ≤ 8 cores per executor the mmap contention largely
  * disappears, but streamed copies are never worse on many-core hosts.
  */
object SparkTune {
  val conf: Map[String, String] = Map(
    "spark.file.transferTo" -> "false",
    "spark.storage.memoryMapThreshold" -> "2g",
    "spark.shuffle.file.buffer" -> "1m",
    // Bound executor scratch space over a long crawl. Shuffle files are
    // deleted by ContextCleaner only after a DRIVER GC collects the
    // dereferenced ShuffleDependency; on a large, quiet driver heap that
    // can be never, so a 30-round crawl accumulates every round's
    // shuffle output on disk (measured: the 3.3M-url local-cluster leg
    // filled 78 GB of /tmp and died of ENOSPC at round ~25 with the
    // default 30min interval). Each round's plans go out of scope as
    // soon as its checkpoints are released, so a periodic driver GC
    // keeps live scratch ≈ the current round's shuffles. On a real
    // cluster this (or an external shuffle service TTL) is the same
    // knob that keeps 1000 executors' local disks bounded over a
    // multi-day crawl.
    "spark.cleaner.periodicGC.interval" -> "2min")
}
