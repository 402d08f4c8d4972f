package graft.tools

import org.apache.spark.sql.functions._
import graft.ScalingBench
import graft.corpus.Synth
import graft.crawl.{Crawler, Recrawl}
import graft.seen.{BloomShard, CuckooShard}

/** Timed evidence for the expiry/recrawl design argument (VERDICT r5
  * "next round" #3): on one completed crawl of the scaling corpus,
  * measure the seen-set MAINTENANCE cost of an expiry
  *
  *  - cuckoo backend: DELETE the expired fingerprints from standing
  *    shards — O(expired) removals;
  *  - Bloom backend: REBUILD the filter from the surviving exact seen
  *    set — O(|seen|) hashing (a Bloom filter cannot delete);
  *
  * then run the recrawl itself both ways (cuckoo prefilter vs plain
  * exact) and assert the re-fetched totals are identical — the
  * correctness gate CrawlerSpec pins at fixture scale, here enforced at
  * corpus scale inside the measurement.
  *
  * The standing-cuckoo build is timed SEPARATELY and excluded from the
  * delete number: a cuckoo-backed crawl carries its shards in state
  * (Crawler.insertAll growth per round), so a real expiry pays only the
  * deletion. Protocol matches ScalingBench: one untimed warmup crawl,
  * ParallelGC, best-of-1 legs with wall timestamps (run multiple
  * processes for reps).
  *
  * args: [cores] [nHosts] [basePages] [richness] [expireFraction]
  * default 32 1000 256 30 0.5 — the 208k-url scaling corpus.
  */
object RecrawlBench {

  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val nHosts = if (args.length > 1) args(1).toInt else 1000
    val basePages = if (args.length > 2) args(2).toInt else 256
    val richness = if (args.length > 3) args(3).toInt else 30
    val expireFrac = if (args.length > 4) args(4).toDouble else 0.5

    implicit val spark: org.apache.spark.sql.SparkSession =
      ScalingBench.session(cores)
    import spark.implicits._

    def timed[T](name: String)(f: => T): (T, Double) = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[recrawl] $name%-28s $s%8.2f s " +
        s"(t=${System.currentTimeMillis()})")
      spark.sparkContext.setJobDescription(null)
      (r, s)
    }

    // untimed JIT/codegen warmup (ScalingBench protocol)
    val (wf, wt) = graft.Bench.runCrawl(spark, 60, 16, 8, roundMs = 200000L)
    System.err.println(s"[recrawl] warmup: $wf urls in $wt s")

    val pages = Synth.pages(spark, nHosts, basePages, richness).toDF().cache()
    pages.count()
    val robots = Synth.robots(spark, nHosts)
    val seeds = Synth.seeds(spark, nHosts)
    val dict = Synth.escoLabels().map(l => (l.concept_uri, l.preferred_label))

    // base crawl (exact path), results retained — they carry the per-page
    // fetch round the expiry cutoff needs
    val ((state, results, _), baseSecs) = timed("base exact crawl") {
      val out = Crawler.crawl(pages, robots, seeds, dict,
        maxRounds = 60, roundMs = 600000L)
      out._2.count() // materialize result slices before the timer stops
      out
    }
    val maxRound = state.round - 1
    val cutoff = math.max(1, math.ceil(maxRound * expireFrac).toInt)
    val expiredHashes = results.toDF()
      .filter(col("round") < cutoff).select("url_hash")
      .localCheckpoint(true)
    val nExpired = expiredHashes.count()
    val nSeen = state.seenHashes.count()
    System.err.println(s"[recrawl] rounds=${state.round} cutoff=$cutoff " +
      s"expired=$nExpired seen=$nSeen")

    // cuckoo sizing per the COVERAGE.md rule, derived from the MEASURED
    // seen-set size (the corpus scales with the CLI args — a hardcoded
    // Params would throw over-capacity on a larger corpus): 64 shards,
    // power-of-2 buckets, capacity ≥ |seen|/(4×0.95). At the default
    // 208k corpus this lands on 64 × 2^12 ≈ 1.05M slots (32 KiB/shard).
    val bucketsNeeded = nSeen / (64.0 * 4 * 0.95)
    var bucketsPerShard = 1 << 10
    while (bucketsPerShard < bucketsNeeded) bucketsPerShard <<= 1
    val cuckooParams = CuckooShard.Params(64, bucketsPerShard)
    System.err.println(s"[recrawl] cuckoo params: 64 × $bucketsPerShard " +
      s"buckets (capacity ${(64L * bucketsPerShard * 4 * 0.95).toLong})")

    // standing cuckoo shards (what a cuckoo-backed crawl carries in
    // state) — built once, NOT part of the delete measurement
    val (fullShards, buildSecs) = timed("cuckoo standing build") {
      val sh = CuckooShard.build(state.seenHashes, cuckooParams)
        .toDF().localCheckpoint(true)
      sh.count()
      sh
    }

    // THE PAIR. Maintenance cost of the same expiry, both backends:
    val (_, deleteSecs) = timed("cuckoo delete (O(expired))") {
      val sh = CuckooShard.delete(
        fullShards.as[graft.model.SeenShard], expiredHashes, cuckooParams)
        .toDF().localCheckpoint(true)
      sh.count()
      sh
    }
    val prunedSeen = state.seenHashes
      .join(expiredHashes, Seq("url_hash"), "left_anti")
      .localCheckpoint(true)
    prunedSeen.count()
    val (_, rebuildSecs) = timed("bloom rebuild (O(|seen|))") {
      val sh = BloomShard.build(prunedSeen, BloomShard.scaleParams)
        .toDF().localCheckpoint(true)
      sh.count()
      sh
    }

    // full recrawl legs, output equality asserted
    val ((_, cuckooRes, _), cuckooRecrawlSecs) = timed("recrawl cuckoo") {
      val out = Recrawl.recrawl(pages, robots, dict, state, results,
        beforeRound = cutoff, useCuckoo = true,
        cuckooParams = cuckooParams, roundMs = 600000L)
      out._2.count()
      out
    }
    val nCuckoo = cuckooRes.count()
    val ((_, exactRes, _), exactRecrawlSecs) = timed("recrawl exact") {
      val out = Recrawl.recrawl(pages, robots, dict, state, results,
        beforeRound = cutoff, useCuckoo = false, roundMs = 600000L)
      out._2.count()
      out
    }
    val nExact = exactRes.count()
    require(nCuckoo == nExact,
      s"recrawl outputs diverge: cuckoo=$nCuckoo exact=$nExact")
    require(nCuckoo == nExpired,
      s"recrawl fetched $nCuckoo of $nExpired expired urls")

    println(s"""{"metric":"recrawl_pair","cores":$cores,""" +
      s""""corpus_fetched":${state.totalFetched},"seen":$nSeen,""" +
      s""""expired":$nExpired,"cutoff_round":$cutoff,""" +
      s""""base_crawl_secs":$baseSecs,""" +
      s""""cuckoo_standing_build_secs":$buildSecs,""" +
      s""""cuckoo_delete_secs":$deleteSecs,""" +
      s""""bloom_rebuild_secs":$rebuildSecs,""" +
      s""""recrawl_cuckoo_secs":$cuckooRecrawlSecs,""" +
      s""""recrawl_exact_secs":$exactRecrawlSecs,""" +
      s""""refetched":$nCuckoo}""")
    spark.stop()
  }
}
