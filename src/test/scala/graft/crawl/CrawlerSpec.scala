package graft.crawl

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.corpus.Synth
import graft.seen.BloomShard

/** End-to-end crawl semantics on the synthetic corpus: politeness,
  * robots, dedup, byte-identical extraction, resume ≡ uninterrupted. */
class CrawlerSpec extends SparkSpec {

  private val NHosts = 6
  private val Base = 6
  private lazy val pages = Synth.pages(spark, NHosts, Base).toDF().cache()
  private lazy val robots = Synth.robots(spark, NHosts)
  private lazy val seeds = Synth.seeds(spark, NHosts)
  private lazy val dictLabels =
    Synth.escoLabels().map(l => (l.concept_uri, l.preferred_label))

  private lazy val full = Crawler.crawl(pages, robots, seeds, dictLabels,
    maxRounds = 40, roundMs = 4000L)(spark)

  test("crawl drains the frontier and fetches pages") {
    val (state, results, lineage) = full
    assert(state.totalFetched > 0)
    assert(results.count() === state.totalFetched)
    assert(lineage.agg(sum("fetch_count")).head.getLong(0) ===
      state.totalFetched)
  }

  test("no robots-disallowed and no exclude-keyword URL is fetched") {
    val (_, results, _) = full
    val urls = results.select("url").collect().map(_.getString(0))
    assert(!urls.exists(_.contains("/private/")))
    assert(!urls.exists(u => Synth.excludeKeywords.exists(u.contains)))
  }

  test("no URL fetched twice (seen-set dedup across rounds)") {
    val (_, results, _) = full
    assert(results.select("url").distinct().count() === results.count())
    assert(results.select("url_hash").distinct().count() === results.count())
  }

  test("politeness: per-host fetches per round ≤ host budget") {
    val (_, results, _) = full
    import spark.implicits._
    val budgets = robots.collect()
      .map(r => r.host -> math.max(1, 4000 / r.crawl_delay_ms)).toMap
    val perRound = results.groupBy("host", "round").count().collect()
    perRound.foreach { row =>
      val host = row.getString(0)
      val n = row.getLong(2)
      assert(n <= budgets(host),
        s"host $host fetched $n in round ${row.getInt(1)}, budget ${budgets(host)}")
    }
  }

  test("priority monotonicity: within a host+round batch, no priority-0 " +
    "URL is selected while a priority-1 URL from the same batch is deferred") {
    // direct property of the selection window: verified on every round by
    // construction (row_number over priority desc) — spot-check the final
    // results: the first round from each host must be its seed (depth 0)
    val (_, results, _) = full
    val firstRounds = results.groupBy("host")
      .agg(min("round").as("r0"))
    val seedRows = results.join(firstRounds,
      results("host") === firstRounds("host") &&
        results("round") === firstRounds("r0"))
    assert(seedRows.filter(col("depth") === 0).count() >= NHosts - 1)
  }

  test("byte-identical extracted text per url vs corpus (input_hint invariant)") {
    val (_, results, _) = full
    val joined = results.toDF().alias("r")
      .join(pages.alias("p"), col("r.url") === col("p.url"))
      .select(col("r.text").as("got"), col("p.text").as("want"))
    assert(joined.filter(col("got") =!= col("want")).count() === 0)
    assert(joined.count() === results.count())
  }

  test("skill extraction: every fetched page with embedded labels has hits") {
    val (_, results, _) = full
    val withSkills = results.filter(size(col("skill_uris")) > 0).count()
    // every synthetic page embeds ≥1 label
    assert(withSkills === results.count())
  }

  test("resume from snapshot ≡ uninterrupted run") {
    val dir = Files.createTempDirectory("graft-snap").toString
    val snap = new Snapshot(dir)(spark)
    // phase 1: stop after 3 rounds
    Crawler.crawl(pages, robots, seeds, dictLabels, maxRounds = 3,
      roundMs = 4000L, snapshot = Some(snap))(spark)
    assert(snap.latest() >= 0)
    // phase 2: resume to completion
    val (s2, r2, _) = Crawler.crawl(pages, robots, seeds, dictLabels,
      maxRounds = 40, roundMs = 4000L, snapshot = Some(snap))(spark)
    val (s1, r1, _) = full
    assert(s2.totalFetched === s1.totalFetched)
    val set1 = r1.select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val set2 = r2.select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(set2 === set1)
    // and the per-round schedule is identical, not just the final set
    val sched1 = r1.select("url", "round").collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    val sched2 = r2.select("url", "round").collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    assert(sched2 === sched1)
  }

  test("snapshot results are append-only slices: round N writes O(slice), " +
      "manifest union reproduces the full table, lineage carries new_links") {
    val dir = Files.createTempDirectory("graft-snap-append").toString
    val snap = new Snapshot(dir)(spark)
    val (state, results, lineage) = Crawler.crawl(pages, robots, seeds,
      dictLabels, maxRounds = 40, roundMs = 4000L,
      snapshot = Some(snap))(spark)
    val last = snap.latest()
    assert(last >= 1) // multi-round crawl
    // each committed slice contains ONLY its round's rows …
    (0 to last).foreach { r =>
      val slice = snap.readSlice(r, "results")
      assert(slice.select("round").distinct().collect()
        .map(_.getInt(0)).toSeq === Seq(r), s"round $r slice")
    }
    // … and the manifest union IS the full results table
    val unioned = snap.read(last, "results")
    assert(unioned.count() === state.totalFetched)
    assert(unioned.select("url").collect().map(_.getString(0)).toSet ===
      results.select("url").collect().map(_.getString(0)).toSet)
    // lineage: every round records its next-round enqueue count on one row
    val perRound = lineage.groupBy("round")
      .agg(sum("new_links").as("nl")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // mid-crawl rounds discover links; the final drained round enqueues 0
    assert(perRound(0) > 0, s"round 0 enqueued nothing: $perRound")
  }

  test("idempotence: one more round after exhaustion fetches nothing") {
    val (state, _, _) = full
    import graft.extract.EscoMatcher
    val dict = EscoMatcher.broadcastDict(spark, dictLabels)
    val out = Round.run(pages, robots, state.frontier, state.seenHashes,
      dict, state.round, 4000L)(spark)
    assert(out.fetchedCount === 0L)
  }

  test("bloom prefilter path produces the same crawl as exact path") {
    val (s1, r1, _) = full
    val (s3, r3, _) = Crawler.crawl(pages, robots, seeds, dictLabels,
      maxRounds = 40, roundMs = 4000L, bloomPrefilter = true)(spark)
    assert(s3.totalFetched === s1.totalFetched)
    assert(r3.select("url").collect().map(_.getString(0)).toSet ===
      r1.select("url").collect().map(_.getString(0)).toSet)
  }

  test("bucketed fetch shape produces the same crawl as the broadcast " +
      "fetch (multi-round loop, corpus partitioned+sorted on url once)") {
    val (s1, r1, _) = full
    val bucketedPages = Crawler.bucketCorpus(
      Synth.pages(spark, NHosts, Base).toDF(), 4).cache()
    try {
      val (s5, r5, _) = Crawler.crawl(bucketedPages, robots, seeds,
        dictLabels, maxRounds = 40, roundMs = 4000L,
        bucketedFetch = true)(spark)
      assert(s5.totalFetched === s1.totalFetched)
      assert(r5.select("url").collect().map(_.getString(0)).toSet ===
        r1.select("url").collect().map(_.getString(0)).toSet)
    } finally bucketedPages.unpersist()
  }

  test("co-partitioned bloom prefilter produces the same crawl as exact") {
    val (s1, r1, _) = full
    val (s4, r4, _) = Crawler.crawl(pages, robots, seeds, dictLabels,
      maxRounds = 40, roundMs = 4000L, bloomPrefilter = true,
      bloomCopartition = true)(spark)
    assert(s4.totalFetched === s1.totalFetched)
    assert(r4.select("url").collect().map(_.getString(0)).toSet ===
      r1.select("url").collect().map(_.getString(0)).toSet)
  }

  test("expiry recrawl: cuckoo delete + re-insert ≡ exact-set recrawl " +
      "(re-fetches exactly the expired pages, restores the full seen set)") {
    val (state, results, _) = full
    val cutoff = 2 // expire everything fetched in rounds 0 and 1
    val expired = results.toDF().filter(col("round") < cutoff)
    val expiredUrls = expired.select("url").collect()
      .map(_.getString(0)).toSet
    assert(expiredUrls.nonEmpty && expiredUrls.size < state.totalFetched,
      "fixture must expire a strict non-empty subset")
    def run(useCuckoo: Boolean) = Recrawl.recrawl(pages, robots,
      dictLabels, state, results, cutoff, useCuckoo,
      cuckooParams = graft.seen.CuckooShard.Params(8, 1 << 9))(spark)
    val (sE, rE, _) = run(useCuckoo = false)
    val (sC, rC, _) = run(useCuckoo = true)
    val urlsE = rE.select("url").collect().map(_.getString(0)).toSet
    val urlsC = rC.select("url").collect().map(_.getString(0)).toSet
    // both paths re-fetch exactly the expired pages, nothing else —
    // survivors stay deduped by the (pruned) seen set even though the
    // re-fetched pages re-discover links to them
    assert(urlsE === expiredUrls)
    assert(urlsC === urlsE)
    assert(sC.totalFetched === sE.totalFetched)
    // the seen set is whole again: every originally-fetched hash present
    def seenSet(s: Crawler.CrawlState) =
      s.seenHashes.select("url_hash").collect().map(_.getLong(0)).toSet
    assert(seenSet(sC) === seenSet(sE))
    assert(seenSet(sE) === results.select("url_hash").collect()
      .map(_.getLong(0)).toSet)
    // per-round schedule equality, not just the final set
    val schedE = rE.select("url", "round").collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    val schedC = rC.select("url", "round").collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    assert(schedC === schedE)
  }

  test("cuckoo-backed seen filter produces the same crawl as exact path " +
      "(full crawl with per-round insertAll growth)") {
    val (s1, r1, _) = full
    val (s6, r6, _) = Crawler.crawl(pages, robots, seeds, dictLabels,
      maxRounds = 40, roundMs = 4000L, bloomPrefilter = true,
      cuckooSeen = true,
      cuckooParams = graft.seen.CuckooShard.Params(8, 1 << 9))(spark)
    assert(s6.totalFetched === s1.totalFetched)
    assert(r6.select("url").collect().map(_.getString(0)).toSet ===
      r1.select("url").collect().map(_.getString(0)).toSet)
  }

  test("bloom shard build over Spark: no false negatives, unseen pass") {
    import spark.implicits._
    val hashes = (1L to 500L).map(i =>
      graft.url.Canonical.hash64(s"https://h$i.edu/")).toDF("url_hash")
    val shards = BloomShard.build(hashes)(spark)
    assert(shards.count() <= BloomShard.testParams.numShards)
    val out = BloomShard.filterUnseen(hashes, shards)(spark)
    assert(out.count() === 0) // all inserted → none pass as unseen
    val fresh = (1L to 500L).map(i =>
      graft.url.Canonical.hash64(s"https://fresh$i.edu/")).toDF("url_hash")
    val passed = BloomShard.filterUnseen(fresh, shards)(spark).count()
    assert(passed >= 490) // few false positives allowed
  }

  test("consume-and-release mode (retainResults=false) crawls the same " +
      "pages: identical state + lineage, empty results handle") {
    val (state, results, lineage) = full
    val (s2, r2, l2) = Crawler.crawl(pages, robots, seeds, dictLabels,
      maxRounds = 40, roundMs = 4000L, retainResults = false)(spark)
    assert(s2.totalFetched === state.totalFetched)
    assert(s2.round === state.round)
    // the seen set (the crawl's URL membership record) must be identical
    assert(s2.seenHashes.except(state.seenHashes).count() === 0L)
    assert(state.seenHashes.except(s2.seenHashes).count() === 0L)
    // lineage counters are preserved in full; the results handle is empty
    assert(l2.agg(sum("fetch_count")).head.getLong(0) ===
      lineage.agg(sum("fetch_count")).head.getLong(0))
    assert(r2.count() === 0L)
    assert(results.count() === state.totalFetched)
  }
}
