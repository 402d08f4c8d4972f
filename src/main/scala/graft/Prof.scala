package graft

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

/** Diagnostic wall/CPU accumulators for hot per-row functions (local
  * mode: driver + executors share the JVM, so a global registry works).
  * Near-zero overhead when unused; the crawl round log drains it via
  * [[snapshotAndReset]] to attribute round cost to components. */
object Prof {
  private val timers = TrieMap.empty[String, AtomicLong]
  private val counts = TrieMap.empty[String, AtomicLong]

  @inline def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    timers.getOrElseUpdate(name, new AtomicLong).addAndGet(
      System.nanoTime() - t0)
    counts.getOrElseUpdate(name, new AtomicLong).incrementAndGet()
    r
  }

  def snapshotAndReset(): String = {
    val parts = timers.keys.toSeq.sorted.map { k =>
      val s = timers(k).getAndSet(0L) / 1e9
      val n = counts.get(k).map(_.getAndSet(0L)).getOrElse(0L)
      f"$k=$s%.1fs/$n"
    }
    parts.mkString(" ")
  }
}
