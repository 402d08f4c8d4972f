package graft.seen

/** Cuckoo filter shard — the deletable fallback of the north rule's
  * seen-set ("sharded Bloom-filter (with cuckoo-filter fallback for
  * deletions)").
  *
  * Standard construction (Fan et al., "Cuckoo Filter: Practically Better
  * Than Bloom", CoNEXT 2014): `numBuckets` buckets × 4 slots of 16-bit
  * fingerprints; an item's two candidate buckets are i1 = hash(x) and
  * i2 = i1 ⊕ hash(fingerprint); insertion evicts on collision for up to
  * `MaxKicks` displacements. Deletion removes one matching fingerprint —
  * the operation Bloom cannot do (needed when a URL must be re-crawled,
  * e.g. retry after a failed fetch frees its seen-slot).
  *
  * Eviction choice is derandomized (slot picked by a mix of the kick
  * counter and fingerprint) so filter state is a deterministic function
  * of the insertion sequence — required for snapshot-reproducible runs.
  */
final class CuckooFilter(val numBuckets: Int) extends Serializable {
  require((numBuckets & (numBuckets - 1)) == 0, "numBuckets must be a power of 2")
  val SlotsPerBucket = 4
  val MaxKicks = 500
  // 0 = empty slot; fingerprints are forced non-zero
  private val table = new Array[Short](numBuckets * SlotsPerBucket)
  private var count = 0L

  def size: Long = count

  @inline private def fingerprint(h: Long): Short = {
    val f = ((h >>> 48) & 0xffff).toInt
    (if (f == 0) 1 else f).toShort
  }
  @inline private def bucket1(h: Long): Int =
    (h & (numBuckets - 1)).toInt
  @inline private def altBucket(b: Int, f: Short): Int = {
    // hash the fingerprint with a fixed odd multiplier (Fan et al. §3.1)
    val fh = (f & 0xffffL) * 0x5bd1e995L
    (b ^ fh.toInt) & (numBuckets - 1)
  }

  private def tryInsertAt(b: Int, f: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      val idx = b * SlotsPerBucket + s
      if (table(idx) == 0) { table(idx) = f; return true }
      s += 1
    }
    false
  }

  /** Insert; false when the filter is too full (caller rotates shard). */
  def insert(h: Long): Boolean = {
    var f = fingerprint(h)
    val b1 = bucket1(h)
    val b2 = altBucket(b1, f)
    if (tryInsertAt(b1, f) || tryInsertAt(b2, f)) { count += 1; return true }
    // evict: deterministic slot choice
    var b = if (((h ^ f.toLong) & 1L) == 0L) b1 else b2
    var kicks = 0
    while (kicks < MaxKicks) {
      val slot = java.lang.Math.floorMod(
        CuckooFilter.mix(f.toLong * 31L + kicks), SlotsPerBucket.toLong).toInt
      val idx = b * SlotsPerBucket + slot
      val evicted = table(idx)
      table(idx) = f
      f = evicted
      b = altBucket(b, f)
      if (tryInsertAt(b, f)) { count += 1; return true }
      kicks += 1
    }
    false
  }

  def contains(h: Long): Boolean = {
    val f = fingerprint(h)
    val b1 = bucket1(h)
    val b2 = altBucket(b1, f)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(b1 * SlotsPerBucket + s) == f ||
          table(b2 * SlotsPerBucket + s) == f) return true
      s += 1
    }
    false
  }

  /** Delete one occurrence; true when a matching fingerprint was removed.
    * (Only safe for items previously inserted — standard cuckoo caveat.) */
  def delete(h: Long): Boolean = {
    val f = fingerprint(h)
    val b1 = bucket1(h)
    val b2 = altBucket(b1, f)
    var s = 0
    while (s < SlotsPerBucket) {
      val i1 = b1 * SlotsPerBucket + s
      if (table(i1) == f) { table(i1) = 0; count -= 1; return true }
      val i2 = b2 * SlotsPerBucket + s
      if (table(i2) == f) { table(i2) = 0; count -= 1; return true }
      s += 1
    }
    false
  }

  private[seen] def restore(idx: Int, v: Short): Unit = {
    table(idx) = v
    count += 1
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + table.length * 2)
    bb.putInt(numBuckets)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def fromBytes(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val nb = bb.getInt
    val f = new CuckooFilter(nb)
    var i = 0
    while (bb.hasRemaining) {
      val v = bb.getShort
      if (v != 0) f.restore(i, v)
      i += 1
    }
    f
  }
}
