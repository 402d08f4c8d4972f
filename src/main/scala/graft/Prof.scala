package graft

import java.util.concurrent.atomic.LongAdder
import scala.collection.concurrent.TrieMap

/** Diagnostic wall/CPU accumulators for hot per-row functions (local
  * mode: driver + executors share the JVM, so a global registry works).
  *
  * Gated: the wrapped UDFs run millions of times per crawl round across
  * all task threads, so the timers are active only when `GRAFT_PROF=1`
  * or `GRAFT_ROUND_LOG=1` is set at JVM start — otherwise `time` is a
  * single static-final branch and zero shared-state traffic (shared
  * AtomicLong CASes from 32 cores are exactly the cache-line contention
  * the crawl's GC work removed). Accumulation uses striped [[LongAdder]]s
  * rather than AtomicLongs for the same reason. */
object Prof {
  /** Read once at class load; flipping it requires a new JVM. */
  val enabled: Boolean = sys.env.get("GRAFT_PROF").contains("1") ||
    sys.env.get("GRAFT_ROUND_LOG").contains("1")

  private val timers = TrieMap.empty[String, LongAdder]
  private val counts = TrieMap.empty[String, LongAdder]

  @inline def time[T](name: String)(f: => T): T = {
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      val r = f
      timers.getOrElseUpdate(name, new LongAdder).add(System.nanoTime() - t0)
      counts.getOrElseUpdate(name, new LongAdder).increment()
      r
    }
  }

  /** Count-only accumulator (no timer) for call-census diagnostics. */
  @inline def hit(name: String): Unit =
    if (enabled) counts.getOrElseUpdate(name, new LongAdder).increment()

  def count(name: String): Long =
    counts.get(name).map(_.sum()).getOrElse(0L)

  def snapshotAndReset(): String = {
    val parts = timers.keys.toSeq.sorted.map { k =>
      val s = timers(k).sumThenReset() / 1e9
      val n = counts.get(k).map(_.sumThenReset()).getOrElse(0L)
      f"$k=$s%.1fs/$n"
    }
    parts.mkString(" ")
  }
}
