package graft.seen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.SeenShard

/** Sharded cuckoo-filter URL-seen set — the DELETABLE variant of the
  * north rule's seen set ("sharded Bloom-filter (with cuckoo-filter
  * fallback for deletions)").
  *
  * Same sharding layout as [[BloomShard]] (`shard_id = floorMod(url_hash,
  * numShards)`, one serialized filter per shard row, kind = "cuckoo") so
  * cuckoo shards flow through the SAME crawl machinery: the flag layouts
  * in BloomShard dispatch on `SeenShard.kind`, and the flag-and-verify
  * contract is unchanged (a cuckoo filter also has false positives —
  * fingerprint collisions — so maybe-seen rows are verified against the
  * exact set exactly like the Bloom path; output ≡ exact at any
  * collision rate).
  *
  * What cuckoo adds over Bloom is O(expired) DELETION: an expiry/recrawl
  * round (drop pages fetched before round N from the seen set and
  * re-fetch them — [[graft.crawl.Recrawl]]) deletes just the expired
  * fingerprints from their shards; a Bloom seen set can only be REBUILT
  * from the full surviving exact set, O(|seen|) hashing per expiry.
  * Deletion is exact-membership-safe for previously-inserted keys:
  * duplicate (bucket, fingerprint) pairs occupy separate slots, so
  * deleting an expired key never erases a colliding survivor
  * (Fan et al., CoNEXT 2014 §4; FiltersSpec pins it).
  *
  * Determinism: filter bytes are a function of the insertion SEQUENCE,
  * so every group sorts its hashes before inserting — shard bytes are
  * then a deterministic function of shard CONTENT (set semantics), which
  * snapshot-reproducible runs require. Groups are one seen-set shard
  * (≈|seen|/numShards keys — the same memory the filter itself costs).
  *
  * Unlike Bloom's OR-mergeable bitsets, cuckoo insertion is not
  * associative: build is a plain groupByKey (one shuffle of the hashes,
  * no map-side partial filters) and incremental growth is a cogroup of
  * the shard table with the new-hash slice — O(slice) insertions plus
  * one pass over the shard bytes, the same per-round cost profile as the
  * Bloom path's incremental union.
  */
object CuckooShard {

  /** `bucketsPerShard` × 4 slots bounds a shard's capacity at ~0.95 load
    * (Fan et al. Table 2); sizing beyond that throws rather than
    * silently degrading (the caller re-shards — not needed at any
    * corpus this repo times). */
  final case class Params(numShards: Int, bucketsPerShard: Int) {
    /** Probe-side params for [[BloomShard]]'s flag layouts: only
      * `numShards` is read on the cuckoo dispatch path (the filter bytes
      * are self-describing); bitsPerShard/k are Bloom-only. */
    def probeParams: BloomShard.Params = BloomShard.Params(numShards, 0, 0)
  }
  /** 16 shards × 1024 buckets × 4 slots ≈ 65k keys — fixture scale. */
  val testParams: Params = Params(16, 1 << 10)

  private def insertSorted(f: CuckooFilter, hs: Array[Long]): Unit = {
    java.util.Arrays.sort(hs)
    var i = 0
    while (i < hs.length) {
      if (!f.insert(hs(i)))
        throw new IllegalStateException(
          s"cuckoo shard over capacity at ${f.size} keys " +
            s"(${f.numBuckets} buckets) — re-shard with more/larger shards")
      i += 1
    }
  }

  private def keyedHashes(hashes: DataFrame, numShards: Int)
      (implicit spark: SparkSession) = {
    import spark.implicits._
    hashes.select(col("url_hash").as[Long],
        pmod(col("url_hash"), lit(numShards.toLong)).cast("int").as[Int])
      .groupByKey(_._2)
  }

  /** Build shards from a DataFrame with a `url_hash` column (assumed a
    * set — the crawl seen set is dedup'd by construction). One shuffle. */
  def build(hashes: DataFrame, p: Params = testParams)
      (implicit spark: SparkSession): Dataset[SeenShard] = {
    import spark.implicits._
    keyedHashes(hashes, p.numShards).mapGroups { (sid, rows) =>
      val f = new CuckooFilter(p.bucketsPerShard)
      insertSorted(f, rows.map(_._1).toArray)
      SeenShard(sid, "cuckoo", f.toBytes)
    }
  }

  /** Insert a slice of new hashes (disjoint from the current contents —
    * the per-round fetch slice is disjoint from seen by construction)
    * into the existing shards. Cogroup on shard_id: one small shuffle of
    * the slice, one pass over the shard bytes. */
  def insertAll(shards: Dataset[SeenShard], newHashes: DataFrame,
      p: Params = testParams)
      (implicit spark: SparkSession): Dataset[SeenShard] = {
    import spark.implicits._
    shards.groupByKey(_.shard_id)
      .cogroup(keyedHashes(newHashes, p.numShards)) { (sid, sh, hs) =>
        val f = sh.toSeq.headOption.map(s => CuckooFilter.fromBytes(s.bits))
          .getOrElse(new CuckooFilter(p.bucketsPerShard))
        insertSorted(f, hs.map(_._1).toArray)
        Iterator.single(SeenShard(sid, "cuckoo", f.toBytes))
      }
  }

  /** Delete expired hashes from their shards — O(expired) fingerprint
    * removals, the operation the Bloom path cannot perform. Hashes not
    * present are ignored (delete returns false); callers pass hashes
    * they previously inserted (the standard cuckoo deletion contract). */
  def delete(shards: Dataset[SeenShard], expiredHashes: DataFrame,
      p: Params = testParams)
      (implicit spark: SparkSession): Dataset[SeenShard] = {
    import spark.implicits._
    shards.groupByKey(_.shard_id)
      .cogroup(keyedHashes(expiredHashes, p.numShards)) { (sid, sh, hs) =>
        sh.toSeq.headOption match {
          case None => Iterator.empty
          case Some(s) =>
            val f = CuckooFilter.fromBytes(s.bits)
            val arr = hs.map(_._1).toArray
            java.util.Arrays.sort(arr)
            arr.foreach(f.delete)
            Iterator.single(SeenShard(sid, "cuckoo", f.toBytes))
        }
      }
  }
}
