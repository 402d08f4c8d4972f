package graft.seen

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.model.SeenShard
import graft.url.Canonical

/** Sharded Bloom-filter URL-seen set.
  *
  * Replaces the reference's in-memory exact `Set()` of seen links
  * (/root/reference/apify.js:32,145-153) — exact sets cannot hold 10^10
  * URLs; the north rule mandates a sharded Bloom filter over
  * canonicalized + murmur3'd URLs.
  *
  * Layout: `shard_id = floorMod(url_hash, numShards)`; each shard is an
  * independent Bloom filter of `bitsPerShard` bits with `k` hash probes
  * derived from the two 64-bit halves of the url's murmur128 (standard
  * double-hashing construction, Kirsch & Mitzenmacher 2006: g_i = h1 + i·h2).
  * At 10^10 keys / 4096 shards ≈ 2.4M keys per shard; at 10 bits/key a
  * shard is ~3 MiB and fpp ≈ 0.8% with k=7 — each executor broadcasts only
  * the shards co-partitioned with its frontier partitions. Tests run 16
  * shards × small m; the math is scale-free.
  *
  * Build is a Spark `Aggregator` (groupBy(shard_id).agg(...)) so shard
  * construction is a single shuffle with map-side partial aggregation
  * (partial bitsets OR-merge associatively).
  */
object BloomShard {

  final case class Params(numShards: Int, bitsPerShard: Int, k: Int)
  val testParams: Params = Params(16, 1 << 16, 7)

  @inline def shardOf(urlHash: Long, numShards: Int): Int =
    java.lang.Math.floorMod(urlHash, numShards.toLong).toInt

  /** Set the k probe bits for one key in a bitset (long-array backed). */
  def setBits(bits: Array[Long], urlHash: Long, m: Int, k: Int): Unit = {
    val h2 = Canonical.murmur128(
      Array[Byte](
        (urlHash >>> 56).toByte, (urlHash >>> 48).toByte,
        (urlHash >>> 40).toByte, (urlHash >>> 32).toByte,
        (urlHash >>> 24).toByte, (urlHash >>> 16).toByte,
        (urlHash >>> 8).toByte, urlHash.toByte), 0x9747b28cL)._2
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(urlHash + i.toLong * h2, m.toLong).toInt
      bits(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  def mightContain(bits: Array[Long], urlHash: Long, m: Int, k: Int): Boolean = {
    val h2 = Canonical.murmur128(
      Array[Byte](
        (urlHash >>> 56).toByte, (urlHash >>> 48).toByte,
        (urlHash >>> 40).toByte, (urlHash >>> 32).toByte,
        (urlHash >>> 24).toByte, (urlHash >>> 16).toByte,
        (urlHash >>> 8).toByte, urlHash.toByte), 0x9747b28cL)._2
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(urlHash + i.toLong * h2, m.toLong).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  /** Aggregator: (url_hash, shard_id) rows → serialized Bloom bitset.
    * Partial buffers OR-merge associatively, so map-side combine shrinks
    * the shuffle to ≤ numShards bitsets per map task regardless of key
    * count — the scale-critical property. */
  final class BloomAgg(m: Int, k: Int)
      extends Aggregator[(Long, Int), Array[Long], Array[Byte]] {
    def zero: Array[Long] = new Array[Long](m >>> 6)
    def reduce(b: Array[Long], r: (Long, Int)): Array[Long] = {
      setBits(b, r._1, m, k); b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Byte] = toBytes(b)
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build shards from a DataFrame with a `url_hash` column. One shuffle
    * of ≤ numShards × maps partial bitsets (map-side combine). */
  def build(hashes: DataFrame, p: Params = testParams)
      (implicit spark: SparkSession): Dataset[SeenShard] = {
    import spark.implicits._
    val agg = new BloomAgg(p.bitsPerShard, p.k)
    hashes
      .select(col("url_hash").as[Long],
        pmod(col("url_hash"), lit(p.numShards.toLong)).cast("int").as[Int])
      .groupByKey(_._2)
      .agg(agg.toColumn)
      .map { case (sid, bytes) => SeenShard(sid, "bloom", bytes) }
  }

  /** Union two shard sets (bitwise OR per shard_id). */
  def union(a: Dataset[SeenShard], b: Dataset[SeenShard])
      (implicit spark: SparkSession): Dataset[SeenShard] = {
    import spark.implicits._
    a.union(b).groupByKey(_.shard_id).reduceGroups { (x, y) =>
      val xa = fromBytes(x.bits); val ya = fromBytes(y.bits)
      var i = 0
      while (i < xa.length) { xa(i) |= ya(i); i += 1 }
      SeenShard(x.shard_id, x.kind, toBytes(xa))
    }.map(_._2)
  }

  /** Membership prefilter: broadcast all shards to executors, keep rows
    * whose hash is NOT maybe-in the filter. At full scale shards are
    * co-partitioned with the frontier instead of broadcast whole; in both
    * layouts this is a map-side filter with no shuffle on the big side. */
  def filterUnseen(frontier: DataFrame, shards: Dataset[SeenShard],
      p: Params = testParams)(implicit spark: SparkSession): DataFrame = {
    val shardMap: Map[Int, Array[Long]] =
      shards.collect().map(s => s.shard_id -> fromBytes(s.bits)).toMap
    val bc = spark.sparkContext.broadcast(shardMap)
    val unseen = udf { (h: Long) =>
      bc.value.get(shardOf(h, p.numShards)) match {
        case Some(bits) => !mightContain(bits, h, p.bitsPerShard, p.k)
        case None => true
      }
    }
    frontier.filter(unseen(col("url_hash")))
  }
}
