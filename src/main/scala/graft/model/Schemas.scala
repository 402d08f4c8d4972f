package graft.model

import java.sql.Timestamp

/** Core case classes for the crawl engine.
  *
  * Shapes follow the reference's persisted structures:
  *  - Page: the BASELINE.json input_hint corpus shape
  *    (url, warc_ts, html, text, lang).
  *  - FrontierEntry: the Crawlee request-queue record
  *    (/root/reference/storage/request_queues/default/0WHwh8iWzgYbrv1.json:1-8
  *    — uniqueKey, retryCount, userData.__crawlee.crawlDepth, orderNo)
  *    re-keyed to the north-rule ordering (host, priority, warc_ts).
  *  - Lineage: the per-run counter set of
  *    /root/reference/storage/key_value_stores/default/SDK_CRAWLER_STATISTICS_0.json:1-10.
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

final case class Seed(url: String)

/** Per-host politeness rules (north-rule addition; the reference has no
  * robots gating — Crawlee BasicCrawler default off). */
final case class RobotsRule(
    host: String,
    disallow_prefixes: Seq[String],
    crawl_delay_ms: Int)

/** One ESCO dictionary row (schema of /root/reference/main.py:23-68 and
  * csv_exports/Skill.csv). */
final case class EscoLabel(
    concept_uri: String,
    preferred_label: String,
    skill_type: String)

/** A frontier (priority-queue) entry. Partition key is hash(host); the
  * deterministic queue order within a host is
  * (priority desc, warc_ts asc, url asc). */
final case class FrontierEntry(
    url: String,
    url_hash: Long,
    host: String,
    priority: Int,
    warc_ts: Timestamp,
    depth: Int,
    retry_count: Int)

/** One fetched+extracted page result (analog of the per-lesson JSON sink,
  * /root/reference/test_pipeline.py:480-503, with ESCO hits attached) plus
  * the content signatures a training-data crawl computes per page:
  * 64-bit SimHash, MinHash sketch, predicted language, token count. */
final case class CrawlResult(
    url: String,
    url_hash: Long,
    host: String,
    round: Int,
    depth: Int,
    text: String,
    lang: String,
    skill_uris: Seq[String],
    skill_labels: Seq[String],
    simhash: Long,
    minhash: Seq[Long],
    lang_pred: String,
    n_tokens: Int)

/** Per-partition, per-round lineage counters
  * (requestsFinished/Failed/new-links analog). */
final case class Lineage(
    round: Int,
    partition_id: Int,
    fetch_count: Long,
    extract_count: Long,
    new_links: Long,
    skill_hits: Long)

/** A seen-set shard: serialized Bloom (or cuckoo) filter bits. */
final case class SeenShard(shard_id: Int, kind: String, bits: Array[Byte])
