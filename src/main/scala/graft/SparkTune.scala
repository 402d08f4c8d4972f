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
    "spark.shuffle.file.buffer" -> "1m")
}
